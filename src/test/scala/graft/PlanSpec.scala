package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits: these assertions are the "would this survive
  * a 100× scale-up" checks — filters/projections must reach the
  * parquet scan, small dims must broadcast, fact-fact joins must
  * sort-merge, aggregates must be partial+final, global top-k must
  * never global-sort. A regression here usually costs nothing at
  * sf0.01 and everything at 100 TB. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q_filter_project: predicates and projection pushed to the scan") {
    val plan = planOf("q_filter_project")
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") ||
      plan.contains("IsNotNull(l_shipdate)"), "shipdate filter not pushed")
    // pruned read: none of the untouched columns may appear in ReadSchema
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_tax"),
      s"column pruning failed: $readSchema")
  }

  test("q_join_broadcast: dim side is a BroadcastHashJoin") {
    assert(planOf("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_join_sortmerge: merge hint produces SortMergeJoin") {
    assert(planOf("q_join_sortmerge").contains("SortMergeJoin"))
  }

  test("q_join_semi/anti plan as semi/anti joins, not row-multiplying joins") {
    assert(planOf("q_join_semi").contains("LeftSemi"))
    assert(planOf("q_join_anti").contains("LeftAnti"))
  }

  test("q1: aggregation is partial (map-side) + final") {
    val plan = planOf("q1_pricing_summary")
    assert(plan.contains("partial_sum") || plan.contains("partial_"),
      "no map-side partial aggregation in q1 plan")
  }

  test("q_topk_global: TakeOrderedAndProject, never a global sort") {
    val plan = planOf("q_topk_global")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("q1 runs inside whole-stage codegen") {
    // AQE wraps the plan until execution; disable it for a static look
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("q1_pricing_summary")(spark, sfDir).queryExecution
      val codegen = qe.explainString(org.apache.spark.sql.execution.CodegenMode)
      val found = "Found (\\d+) WholeStageCodegen".r.findFirstMatchIn(codegen)
      assert(found.exists(_.group(1).toInt > 0), codegen.take(500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("as-of join plans with no join operator at all (union + window)") {
    val plan = planOf("q_join_asof")
    assert(!plan.contains("Join"), s"as-of should be join-free:\n${plan.take(1200)}")
    assert(plan.contains("Window"), "expected the running-window formulation")
  }

  test("minhash near-dup never plans a cartesian product") {
    val plan = planOf("q_dedup_minhash")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("knn broadcast the query side, never the corpus") {
    val plan = planOf("q_knn_bruteforce")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(1200))
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    // Bucketing is the 100 TB answer to repeated fact-fact joins on the
    // same key: both sides pre-hashed into the same bucket layout means
    // the sort-merge join needs no Exchange at query time.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sfDir).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    Tables.customer(spark, sfDir).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE b_orders")
      spark.sql("DROP TABLE b_customer")
    }
  }

  test("gold mart partitioned write lays out partition directories") {
    val out = java.nio.file.Files.createTempDirectory("gold_mart").toString
    etl.Medallion.qGoldMart.fn(spark, sfDir)
      .write.mode("overwrite").partitionBy("year").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("year=")), dirs.mkString(","))
    // partition pruning on read: only one year's files are scanned
    val pruned = spark.read.parquet(out).filter(col("year") === 1996)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(scan.contains("PartitionFilters: [isnotnull(year"), scan.take(1500))
  }
}
