package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark-side plan plus (optionally) its ANSI-SQL
  * DuckDB oracle twin. Modules (`ops.*`, `etl.*`) each export a
  * `defs: Map[String, Q]`; `SparkEntry` unions them. Queries without a
  * SQL-expressible oracle (MinHash, SimHash, …) set `oracle = None`
  * and get the driver's weaker rows-only check, as the contract
  * allows. */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(fn, Some(sql))
}
