package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Shuffle-exchange census over the registry — the counting half of
  * the exchange-count plan pin (r12 verdict #5). Every
  * `groupBy`/`join`/`repartition`/global-sort is a ShuffleExchange in
  * the physical plan; an ACCIDENTAL extra one (the q_source_drift
  * 4x-explode class from r9) costs nothing at sf0.01 and a full extra
  * pass over the data at 100 TB. PlanSpec pins every query's count
  * against the committed fixture `src/test/resources/exchange_counts.tsv`
  * and fails BY NAME on growth, turning a plan regression from a
  * bench-archaeology exercise into a named test failure.
  *
  * Counting rules (determinism over completeness):
  *  - counts are taken from the pre-execution plan (through the
  *    [[AdaptiveSparkPlanExec]] wrapper) — what Catalyst PLANNED, not
  *    what AQE later elided at runtime, so the number is stable;
  *  - [[InMemoryTableScanExec]] is DESCENDED into
  *    (`relation.cachedPlan`), so the number is the query's
  *    FULL-LINEAGE shuffle count. This is what makes it stable:
  *    Spark's CacheManager substitutes any registered cached plan
  *    into newly constructed plans at analysis time, so whether a
  *    shared subtree appears raw or as an `InMemoryTableScan`
  *    depends on which consumer ran first in the session — treating
  *    the boundary as opaque made four queries count 2-4 when
  *    counted in a fresh session and 0 after the suite's other specs
  *    had executed them (measured, r13). Counting through the
  *    boundary lands on the same total either way;
  *  - [[ReusedExchangeExec]] is an opaque leaf: a reused exchange is
  *    one shuffle, already counted at its original site.
  */
object ExchangeCensus {

  def countShuffles(p: SparkPlan): Int = {
    val here = p match {
      case _: ShuffleExchangeLike => 1
      case _ => 0
    }
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case c: InMemoryTableScanExec => Seq(c.relation.cachedPlan)
      case _: ReusedExchangeExec => Nil
      case o => o.children
    }
    here + kids.map(countShuffles).sum
  }

  /** Counts for every registered query, in sorted-name order. Batch
    * queries are invoked once UNCOUNTED first, so every SessionMemo
    * shared stage is built and cached before any count is taken —
    * without this, a query's count would differ between "first spec
    * to touch the memo" and "suite already warmed it". Stream drains
    * are excluded from the warm pass (each invocation re-runs a full
    * drain; their returned frame is a plain sink read whose plan
    * never crosses a memo boundary). */
  def censusAll(spark: SparkSession, sfDir: String): Seq[(String, Int)] = {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.filterNot(_.startsWith("q_stream_"))
      .foreach(n => graft.SparkEntry.queries(n)(spark, sfDir))
    names.map { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      n -> countShuffles(df.queryExecution.executedPlan)
    }
  }

  /** Regenerates the committed fixture after a DELIBERATE plan change:
    * `sbt "runMain graft.tools.ExchangeCensus"` — then review the diff
    * of `src/test/resources/exchange_counts.tsv` before committing. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Quiet.muteKnownBenign()
    val out = censusAll(spark, "/root/testdata/sf0.001")
      .map { case (n, c) => s"$n\t$c" }.mkString("", "\n", "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("src/test/resources/exchange_counts.tsv"), out)
    println(s"wrote ${out.linesIterator.size} counts")
    spark.stop()
  }
}
