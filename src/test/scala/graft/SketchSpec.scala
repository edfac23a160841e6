package graft

import org.apache.spark.sql.functions._

/** Error-bound pins for the two true sketch queries — the only
  * rows-only entries without a twin oracle. The driver can't
  * hash-check engine-specific sketch estimates, so the accuracy
  * contract is pinned here instead: estimates must sit within the
  * sketch's configured error of the exact answers. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct lands within 3x its 2% rsd of exact counts") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (p, o)) =>
      val (ap, ao) = approx(k)
      assert(math.abs(ap - p) <= 0.06 * p, s"$k parts: approx $ap vs exact $p")
      assert(math.abs(ao - o) <= 0.06 * o, s"$k orders: approx $ao vs exact $o")
    }
  }

  test("approx_percentile brackets the exact quartiles and stays ordered") {
    val approx = SparkEntry.queries("q_approx_quantiles")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("pq"))
      .select(col("l_returnflag"),
        element_at(col("pq"), 1), element_at(col("pq"), 2), element_at(col("pq"), 3))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(k)
      assert(a25 <= a50 && a50 <= a75, s"$k: quartiles out of order")
      // accuracy 1000 → rank error ≤ 1/1000 of rows; on this price
      // distribution that is well under 5% in value space
      Seq((a25, e25, "q25"), (a50, e50, "q50"), (a75, e75, "q75")).foreach {
        case (a, e, n) =>
          assert(math.abs(a - e) <= 0.05 * math.abs(e), s"$k $n: approx $a vs exact $e")
      }
    }
  }
}
