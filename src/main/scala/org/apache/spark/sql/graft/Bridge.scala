package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}

/** Column ⇄ Expression and DataFrame ⇄ LogicalPlan bridge. Spark 4
  * made the Column(Expression) constructor and Dataset.ofRows
  * `private[sql]`; extensions that define native Catalyst expressions
  * or custom logical operators conventionally expose them through a
  * shim in the org.apache.spark.sql namespace (same pattern
  * third-party connectors use). Only [[graft.functions]] and
  * [[graft.plans]] depend on this. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until queued listener events are delivered — needed by any
    * metrics assertion built on a SparkListener (the bus is async and
    * `waitUntilEmpty` is private[spark]). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Unload every loaded state-store provider on this JVM
    * (`StateStore.unloadAll` is access-restricted like the rest of the
    * execution package). Used by the drain harness at each
    * AvailableNow completion, when every checkpoint this JVM has
    * touched is dead by construction — see the caller's rationale in
    * [[graft.streaming.StreamQueries]]. Safe against live queries:
    * an unloaded provider reloads from its checkpoint on next use. */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
