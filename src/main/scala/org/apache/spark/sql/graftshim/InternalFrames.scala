package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** Minimal bridge into Spark's `private[sql]` internal-row plumbing,
  * used by [[graft.PinnedFrame]] to persist a snapshot in the engine's
  * OWN row format instead of round-tripping through external `Row`s.
  *
  * Why this exists: `Dataset.rdd` deserializes every `InternalRow`
  * into a `GenericRow` (per-field boxing), and `createDataFrame`
  * converts each one back per consume — for a snapshot that exists
  * only to be re-read by further SQL plans, both directions are pure
  * overhead, and the cached blocks hold boxed Java objects instead of
  * compact `UnsafeRow` bytes. `QueryExecution.toRdd` (public) exposes
  * the internal rows; re-entering SQL from an `RDD[InternalRow]` is
  * `SparkSession.internalCreateDataFrame`, which is `private[sql]` —
  * hence this one-object package-placed shim (the standard pattern
  * used by Spark-adjacent OSS libraries to reach `private[sql]`
  * constructors). Nothing else in the repo lives outside the `graft`
  * package. */
object InternalFrames {

  /** The executed plan's internal-row RDD, defensively copied: the
    * runtime reuses one mutable row per partition iterator, so rows
    * must be `copy()`-ed (for `UnsafeRow` a single buffer memcpy)
    * before they cross into block storage. */
  def internalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd.map(_.copy())

  /** Wrap an internal-row RDD back into a DataFrame through a fresh
    * `LogicalRDD` leaf — the schema must be the exact output schema of
    * the plan that produced the rows. */
  def ofInternalRdd(session: org.apache.spark.sql.SparkSession,
                    rdd: RDD[InternalRow], schema: StructType): DataFrame =
    session.asInstanceOf[ClassicSession].internalCreateDataFrame(rdd, schema)
}
