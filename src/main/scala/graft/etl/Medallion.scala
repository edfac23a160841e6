package graft.etl

import graft.{Num, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's bronze → silver → gold medallion
  * (`dags/{bronze,silver,gold}/dag_*_financial_sample.py`) as one
  * narrow Spark pipeline.
  *
  * Where the reference crosses a process + network boundary between
  * every task (Airflow XCom JSON round-trips,
  * `dags/silver/dag_silver_financial_sample.py:46-49,107-110`; per-row
  * JDBC INSERT, `dags/bronze/dag_bronze_financial_sample.py:165-177`),
  * here bronze→silver is a zero-shuffle projection chain and gold is
  * the first (and only) exchange — the partial-aggregated mart
  * shuffle. The gold layer itself never ran in the reference
  * (`dags/gold/dag_gold_financial_sample.py:26` kwarg typo fails at
  * import); its marts are *designed* from the DDL measure columns
  * (`dags/bronze/dag_bronze_financial_sample.py:116-127`) and the
  * README's Power BI intent (`README.md:23-24`).
  *
  * The graded corpus has no financial-sample table, so the bronze
  * frame is derived deterministically from `lineitem` — dirty column
  * names (padded, Excel-style) and money-formatted strings — letting
  * the DuckDB oracle verify the silver parse round-trips exactly.
  */
object Medallion {

  /** Bronze: a financial-sample-shaped frame with the reference's raw
    * messiness (padded headers, `R$`/`$`/`,` money strings). */
  def bronzeFinancial(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag").as(" Segment "),
      col("l_linestatus").as("Country"),
      concat(lit("R$ "), col("l_quantity").cast("string")).as("Units Sold"),
      concat(lit("$"), col("l_extendedprice").cast("string")).as("Sales"),
      concat(lit("$"), (col("l_extendedprice") * col("l_discount")).cast("string")).as("Discounts"),
      concat(lit("$"), (col("l_extendedprice") * col("l_tax")).cast("string")).as("COGS"),
      col("l_shipdate").as("Date"),
      year(col("l_shipdate")).as("Year"))

  /** Silver: the full cleaning pipeline from [[Clean]]. */
  def silverFinancial(s: SparkSession, d: String): DataFrame =
    Clean.silver(bronzeFinancial(s, d))

  /** Gold: the designed BI mart — segment × year revenue/discount/
    * margin. Partial aggregation makes the shuffle carry one decimal
    * buffer per (segment, year), independent of fact size. */
  def goldMart(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("segment"), col("year"))
      .agg(
        Num.dsum(col("sales")).as("revenue"),
        Num.dsum(col("discounts")).as("total_discount"),
        Num.dsum(col("cogs")).as("total_cogs"),
        count(lit(1)).as("n_rows"))
      .withColumn("margin_pct",
        (col("revenue") - col("total_cogs")) / col("revenue") * lit(100.0))
      .orderBy(col("segment"), col("year"))

  /** Silver output (audit timestamp excluded: nondeterministic). The
    * oracle recomputes the same values straight from lineitem — equal
    * iff the dirty-string round-trip is lossless. */
  val qFinancialSilver = Q(
    (s, d) =>
      silverFinancial(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("segment"),
          col("country"), col("units_sold"), col("sales"), col("discounts"),
          col("cogs"), col("date"), col("year"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    """SELECT l_orderkey, l_linenumber,
       l_returnflag AS segment, l_linestatus AS country,
       l_quantity AS units_sold, l_extendedprice AS sales,
       l_extendedprice * l_discount AS discounts,
       l_extendedprice * l_tax AS cogs,
       l_shipdate AS date, YEAR(l_shipdate) AS year
       FROM lineitem ORDER BY l_orderkey, l_linenumber""")

  /** Gold mart over the medallion output. */
  val qFinancialGold = Q(
    (s, d) => goldMart(silverFinancial(s, d)),
    s"""SELECT l_returnflag AS segment, YEAR(l_shipdate) AS year,
       ${Num.sqlSum("l_extendedprice")} AS revenue,
       ${Num.sqlSum("l_extendedprice * l_discount")} AS total_discount,
       ${Num.sqlSum("l_extendedprice * l_tax")} AS total_cogs,
       COUNT(*) AS n_rows,
       (${Num.sqlSum("l_extendedprice")} - ${Num.sqlSum("l_extendedprice * l_tax")})
         / ${Num.sqlSum("l_extendedprice")} * 100.0 AS margin_pct
       FROM lineitem GROUP BY l_returnflag, YEAR(l_shipdate)
       ORDER BY segment, year""")

  /** Star-schema gold mart (the BI shape the reference intended):
    * customer-segment × order-year revenue. */
  val qGoldMart = Q(
    (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), year(col("o_orderdate")).as("year"))
        .agg(
          Num.dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"),
          Num.davg(col("o_totalprice")).as("avg_order"))
        .orderBy(col("segment"), col("year")),
    s"""SELECT c_mktsegment AS segment, YEAR(o_orderdate) AS year,
       ${Num.sqlSum("o_totalprice")} AS revenue, COUNT(*) AS n_orders,
       ${Num.sqlAvg("o_totalprice")} AS avg_order
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment, YEAR(o_orderdate)
       ORDER BY segment, year""")

  /** The UDAF exhibit in a graded query: exact decimal money sum via a
    * typed Aggregator, checked against DuckDB's decimal sum. */
  val qUdafMoneySum = Q(
    (s, d) => {
      graft.udf.Money.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("udaf_lineitem")
      s.sql(
        """SELECT l_returnflag,
           CAST(exact_money_sum(l_extendedprice) AS DOUBLE) AS exact_sum,
           COUNT(*) AS n
           FROM udaf_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    s"""SELECT l_returnflag, ${Num.sqlSum("l_extendedprice")} AS exact_sum,
       COUNT(*) AS n
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** The scalar UDF exhibit: parse_money over generated dirty strings.
    * The oracle recomputes from the clean source — equal iff the UDF
    * parse is lossless. */
  val qUdfParseMoney = Q(
    (s, d) => {
      graft.udf.Money.register(s)
      bronzeFinancial(s, d).createOrReplaceTempView("udf_bronze")
      s.sql(
        """SELECT l_orderkey, l_linenumber,
           parse_money(`Units Sold`) AS units_sold,
           parse_money(`Sales`) AS sales
           FROM udf_bronze ORDER BY l_orderkey, l_linenumber""")
    },
    """SELECT l_orderkey, l_linenumber, l_quantity AS units_sold,
       l_extendedprice AS sales
       FROM lineitem ORDER BY l_orderkey, l_linenumber""")

  /** The native-Expression exhibit in a graded query: same semantics
    * as the UDF, but parsed by [[graft.functions.ParseMoneyExpr]]
    * inside whole-stage codegen. */
  val qParseMoneyNative = Q(
    (s, d) => {
      graft.functions.ParseMoneyExpr.register(s)
      bronzeFinancial(s, d).createOrReplaceTempView("native_bronze")
      s.sql(
        """SELECT l_orderkey, l_linenumber,
           parse_money_native(`Units Sold`) AS units_sold,
           parse_money_native(`Sales`) AS sales
           FROM native_bronze ORDER BY l_orderkey, l_linenumber""")
    },
    """SELECT l_orderkey, l_linenumber, l_quantity AS units_sold,
       l_extendedprice AS sales
       FROM lineitem ORDER BY l_orderkey, l_linenumber""")

  /** S5 under the driver's hash gate (round-10 ask #5): the star gold
    * mart is WRITTEN as a year-partitioned parquet sink (the
    * reference's silver→MinIO parquet step,
    * `dags/silver/dag_silver_financial_sample.py:141,151`, in the
    * layout the gold layer intended), RE-READ through the partitioned
    * directory tree with a partition filter — read-back planning must
    * prune to 3 of the ~7 year directories — and re-aggregated.
    * Revenue stays DECIMAL across the sink so write → read → re-sum
    * is exact end-to-end (one double cast at the very end); the
    * oracle recomputes the same numbers straight from the source
    * tables, so the hash matches iff the partitioned round-trip loses
    * no rows and no value precision. The sink lands under the drains'
    * scratch root (RAM-backed when available — r19, the r15
    * volume-isolation rationale extended to sink round-trips) keyed
    * by the SF dir, so suites running different SFs in one JVM never
    * collide; overwrite mode keeps repeat runs idempotent. */
  val qGoldRoundtrip = Q(
    (s, d) => {
      // through the drains' tmpBase lifecycle (r20, r19 ADVICE):
      // pid-suffixed, shutdown-hook cleaned, stale-swept on a crash
      val dest = graft.streaming.StreamQueries
        .tmpBase("graft_stream_gold_rt_", d).toString
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          year(col("o_orderdate")).as("year"))
        .agg(
          Num.dsumDec(col("o_totalprice")).as("revenue_dec"),
          count(lit(1)).as("n_orders"))
        .write.mode("overwrite").partitionBy("year").parquet(dest)
      s.read.parquet(dest)
        .filter(col("year").between(1994, 1996))
        .groupBy(col("segment"))
        .agg(
          sum(col("revenue_dec")).cast("double").as("revenue"),
          sum(col("n_orders")).as("n_orders"))
        .orderBy(col("segment"))
    },
    s"""WITH mart AS (
         SELECT c_mktsegment AS segment, YEAR(o_orderdate) AS year,
                ${Num.sqlSumDec("o_totalprice")} AS revenue_dec,
                COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2)
       SELECT segment, CAST(SUM(revenue_dec) AS DOUBLE) AS revenue,
              CAST(SUM(n_orders) AS BIGINT) AS n_orders
       FROM mart WHERE year BETWEEN 1994 AND 1996
       GROUP BY segment ORDER BY segment""")

  /** O1 retry semantics. The reference retries each Airflow task once
    * (`default_args retries=1`,
    * `dags/bronze/dag_bronze_financial_sample.py:193`,
    * `dags/silver/dag_silver_financial_sample.py:244`). The Spark
    * split of that responsibility: TASK-level failures are retried by
    * the scheduler (`spark.task.maxFailures`, per-task, executor-side)
    * — this combinator is the APPLICATION-level twin for the
    * driver-side actions an Airflow task wraps (a JDBC load, an HTTP
    * fetch, a whole stage run), where a transient failure should
    * re-run the action, not kill the pipeline. Retries are whole-action
    * re-executions, which is safe exactly because the medallion stages
    * are deterministic DataFrame plans and idempotent overwrite-mode
    * sinks, and uses exponential backoff like Airflow's
    * `retry_delay`/`retry_exponential_backoff`. */
  @annotation.tailrec
  def withRetry[A](retries: Int = 1, backoffMs: Long = 0L)(action: => A): A = {
    val attempt =
      try Right(action)
      catch { case e if scala.util.control.NonFatal(e) => Left(e) }
    attempt match {
      case Right(a) => a
      case Left(e) if retries <= 0 => throw e
      case Left(_) =>
        if (backoffMs > 0) Thread.sleep(backoffMs)
        withRetry(retries - 1, backoffMs * 2)(action)
    }
  }

  val defs: Map[String, Q] = Map(
    "q_financial_silver" -> qFinancialSilver,
    "q_financial_gold" -> qFinancialGold,
    "q_gold_mart" -> qGoldMart,
    "q_gold_roundtrip" -> qGoldRoundtrip,
    "q_udaf_money_sum" -> qUdafMoneySum,
    "q_udf_parse_money" -> qUdfParseMoney,
    "q_parse_money_native" -> qParseMoneyNative)
}
