package graft

import graft.functions.DotProductExpr
import org.apache.spark.sql.functions._

/** The native dot-product Expression: agreement with the HOF
  * formulation, null semantics, SQL registry, and codegen. */
class DotProductSpec extends SparkSpec {

  test("dot_f equals the zip_with/aggregate HOF formulation on real embeddings") {
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val a = vecs.withColumnRenamed("embedding", "ea").withColumnRenamed("vec_id", "ia")
    val b = vecs.withColumnRenamed("embedding", "eb").withColumnRenamed("vec_id", "ib")
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib")).limit(500)
    val both = pairs.select(
      DotProductExpr.dotF(col("ea"), col("eb")).as("native"),
      expr("aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (n, h) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(n - h) <= 1e-6 * math.max(1.0, math.abs(h)), s"$n vs $h")
    }
  }

  test("null input and mismatched lengths both yield null (matching the HOF)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f, 9.0f))), // truncated/corrupt pair
      (None, Some(Seq(1.0f))))
      .toDF("a", "b")
      .select(DotProductExpr.dotF(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 11.0) // 1*3 + 2*4
    assert(rows(1).isNullAt(0), "length mismatch must surface as NULL, not a prefix product")
    assert(rows(2).isNullAt(0))
  }

  test("SQL registry rejects wrong arity with an analysis error, not an index crash") {
    DotProductExpr.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("dot_arity")
    val e = intercept[Exception] {
      spark.sql("SELECT dot_f(embedding) FROM dot_arity").collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.contains("requires exactly 2 arguments"), chain)
  }

  test("works through the SQL registry and inside whole-stage codegen") {
    DotProductExpr.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("dot_embeddings")
    val df = spark.sql(
      "SELECT vec_id, dot_f(embedding, embedding) AS norm_sq FROM dot_embeddings ORDER BY vec_id")
    val norms = df.collect() // execute first: AQE finalizes codegen spans at runtime
    assert(norms.length > 0 && norms.forall(r => r.getDouble(1) >= 0.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"), plan.take(800))
  }
}
