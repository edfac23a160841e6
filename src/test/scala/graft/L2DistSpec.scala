package graft

import graft.functions.L2DistExpr
import org.apache.spark.sql.functions._

/** The native L2 Expression under the IVF assignment: BIT-equality
  * with the HOF formulation (not tolerance — the oracle contract
  * requires the identical IEEE sequence), and dot_f-style null
  * semantics. */
class L2DistSpec extends SparkSpec {

  test("l2_dist is bit-identical to the zip_with/aggregate HOF fold") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val a = vecs.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = vecs.select(col("vec_id").as("ib"), col("v").as("vb"))
    val both = a.crossJoin(b).filter(col("ia") < col("ib")).limit(500)
      .select(
        L2DistExpr.l2Dist(col("va"), col("vb")).as("native"),
        expr("aggregate(zip_with(va, vb, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("null input and mismatched lengths yield null") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(4.0, 6.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(4.0, 6.0, 9.0))),
      (None, Some(Seq(1.0))))
      .toDF("a", "b")
      .select(L2DistExpr.l2Dist(col("a"), col("b")).as("d"))
      .collect()
    assert(rows(0).getDouble(0) === 25.0) // 3² + 4²
    assert(rows(1).isNullAt(0), "length mismatch must surface as NULL")
    assert(rows(2).isNullAt(0))
  }

  test("whole-stage codegen keeps the kernel inline") {
    // AQE wraps the plan until execution; disable it for a static look
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val vecs = Tables.embeddings(spark, sfDir)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val df = vecs.select(L2DistExpr.l2Dist(col("v"), col("v")).as("d"))
        .agg(sum("d"))
      val codegen = df.queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
      val found = "Found (\\d+) WholeStageCodegen".r.findFirstMatchIn(codegen)
      assert(found.exists(_.group(1).toInt >= 1), codegen.take(600))
      assert(df.collect().head.getDouble(0) === 0.0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
