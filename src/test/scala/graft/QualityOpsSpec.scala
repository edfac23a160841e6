package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the data-quality family (QualityOps): the graded
  * queries show the clean-data result, so these tests prove the
  * DETECTION side on injected dirty data — a validator that can only
  * say "pass" is untested. All frames here are synthetic (not
  * `Tables`), pinning the API's independence from the testdata. */
class QualityOpsSpec extends SparkSpec {

  import ops.QualityOps

  test("profile reports exact counts, distincts and rendered min/max per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a"), 10.5),
      (2L, Option("b"), 99.25),
      (3L, None: Option[String], 10.5),
      (3L, Option("a"), -1.0)).toDF("id", "s", "v")
    val prof = QualityOps.profile(df, Seq(
      "id" -> identity,
      "s" -> identity,
      "v" -> (_.cast(org.apache.spark.sql.types.DecimalType(18, 2)))))
    val byCol = prof.collect().map(r => r.getString(0) -> r).toMap
    assert(byCol.keySet === Set("id", "s", "v"))
    val id = byCol("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 4L && id.getLong(3) === 3L)
    assert(id.getString(4) === "1" && id.getString(5) === "3")
    val s = byCol("s")
    assert(s.getLong(2) === 3L, "count(s) must skip the null")
    assert(s.getLong(3) === 2L, "distinct(s) must skip the null")
    assert(s.getString(4) === "a" && s.getString(5) === "b")
    val v = byCol("v")
    assert(v.getString(4) === "-1.00" && v.getString(5) === "99.25")
  }

  test("constraint checks count violations on injected dirty data") {
    import spark.implicits._
    val dirty = Seq((1L, "X"), (1L, "F"), (2L, "O")).toDF("pk", "status")
    val dim = Seq(1L).toDF("k")
    val checks = Seq(
      QualityOps.Check("pk_unique",
        dirty.agg((count(lit(1)) - countDistinct(col("pk"))).as("v"))),
      QualityOps.Check("fk_closed",
        dirty.join(dim, dirty("pk") === dim("k"), "left_anti")
          .agg(count(lit(1)).as("v"))),
      QualityOps.Check("status_domain",
        dirty.filter(!col("status").isin("F", "O", "P")).agg(count(lit(1)).as("v"))))
    val out = QualityOps.checkConstraints(checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("pk_unique") === ((1L, false)), "one duplicated pk")
    assert(out("fk_closed") === ((1L, false)), "pk=2 has no dim row")
    assert(out("status_domain") === ((1L, false)), "'X' is out of domain")
  }

  test("all standard checks pass on the clean testdata") {
    val out = QualityOps.checkConstraints(QualityOps.standardChecks(spark, sfDir))
      .collect()
    assert(out.length === 5)
    out.foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} unexpectedly failed"))
  }

  test("IQR fences flag exactly the planted outliers, in the right direction") {
    import spark.implicits._
    // group g: tight cluster 100..120 plus one huge and one tiny value
    val vals = (0 until 21).map(i => ("g", 100.0 + i)) ++
      Seq(("g", 10000.0), ("g", -10000.0), ("h", 5.0), ("h", 6.0))
    val out = QualityOps.outliersIqr(vals.toDF("grp", "v"), "grp", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(4) === 1L, "exactly the planted high outlier")
    assert(g.getLong(5) === 1L, "exactly the planted low outlier")
    val h = out("h")
    assert(h.getLong(4) === 0L && h.getLong(5) === 0L, "tiny group has no outliers")
    // quartile values are the exact discrete ranks, not interpolations
    // n=23 → r1=(n+3) div 4=6 → 6th value 104; r3=(3n+3) div 4=18 → 116
    assert(g.getDouble(2) === 104.0 && g.getDouble(3) === 116.0)
  }
}
