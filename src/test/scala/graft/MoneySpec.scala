package graft

import graft.etl.Clean
import graft.functions.ParseMoneyExpr
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The money-parse family: column-function (built-ins), scalar UDF,
  * and native Catalyst Expression must all implement the reference's
  * silver cleanup semantics
  * (dags/silver/dag_silver_financial_sample.py:76-82, intended form per
  * SURVEY.md §1.4) identically. */
class MoneySpec extends SparkSpec {

  private val cases: Seq[(String, Option[Double])] = Seq(
    "R$ 1,234.56" -> Some(1234.56),
    "$99" -> Some(99.0),
    " 12 " -> Some(12.0),
    "1,000,000.25" -> Some(1000000.25),
    "R$-5.5" -> Some(-5.5),
    "abc" -> None,
    "" -> None,
    "$" -> None)

  test("ParseMoneyExpr.strip/parseOrNull unit semantics") {
    assert(ParseMoneyExpr.strip("R$ 1,234.56") === "1234.56")
    assert(ParseMoneyExpr.strip("$\t9 9") === "99")
    assert(ParseMoneyExpr.parseOrNull("") === null)
    assert(ParseMoneyExpr.parseOrNull("x1") === null)
    assert(ParseMoneyExpr.parseOrNull("42.5") === 42.5)
  }

  test("all three implementations agree on every case (incl. null)") {
    val schema = StructType(Seq(StructField("raw", StringType, nullable = true)))
    val rows = cases.map(c => Row(c._1)) :+ Row(null)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    graft.udf.Money.register(spark)
    val out = df.select(
      col("raw"),
      Clean.parseMoney(col("raw")).as("via_builtin"),
      call_udf("parse_money", col("raw")).as("via_udf"),
      ParseMoneyExpr.parseMoneyNative(col("raw")).as("via_native"))
      .collect()
    out.foreach { r =>
      val expected = Option(r.getString(0)).flatMap(s =>
        cases.collectFirst { case (in, exp) if in == s => exp }.flatten)
      def v(i: Int): Option[Double] = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      assert(v(1) === expected, s"builtin on ${r.getString(0)}")
      assert(v(2) === expected, s"udf on ${r.getString(0)}")
      assert(v(3) === expected, s"native on ${r.getString(0)}")
    }
  }

  test("native expression works through the SQL registry and codegen") {
    ParseMoneyExpr.register(spark)
    val r = spark.sql("SELECT parse_money_native('R$ 7,500.25') AS v").collect()(0)
    assert(r.getDouble(0) === 7500.25)
    val n = spark.sql("SELECT parse_money_native('nope') AS v").collect()(0)
    assert(n.isNullAt(0))
  }

  test("exact money sum Aggregator matches decimal ground truth") {
    graft.udf.Money.register(spark)
    val df = Tables.lineitem(spark, sfDir)
    df.createOrReplaceTempView("money_li")
    val agg = spark.sql(
      "SELECT CAST(exact_money_sum(l_extendedprice) AS DOUBLE) AS s FROM money_li")
      .collect()(0).getDouble(0)
    val truth = df.select(
      sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(agg === truth)
  }
}
