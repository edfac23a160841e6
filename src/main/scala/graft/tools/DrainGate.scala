package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-drain budget gate (r15 verdict #6): the exchange census
  * freezes BATCH plan structure by name, but the 8 `q_stream_*`
  * drains are intentionally unpinned there (their returned frame is
  * a post-hoc sink read — the pipeline is the exhibit), so a drain
  * regression was only caught by eyeballing the graded trio. This
  * gate runs every drain under the bench isolation conditions
  * (RAM-backed stream tmp when available, maintenance deferred,
  * providers unloaded per drain — all the Bench defaults) and fails
  * BY NAME when a drain's median-of-3 steady-state exceeds its
  * committed budget.
  *
  * Budgets live in `src/test/resources/drain_budgets.tsv`
  * (`name<TAB>budget_seconds`), set at 2× the committed steady-state
  * median (docs/SCALE.md drain table) — the documented honest
  * variance envelope: per-sample jitter on a 32-thread local session
  * measured up to ~1.8× run-over-run at identical code (r16 passes),
  * so a 2× line trips on q_stream_join drifting 7 → 14 s (the r15
  * verdict's example) while staying quiet on scheduler noise.
  * Regenerate deliberately with `--write` after reviewing the diff,
  * exactly like the exchange census fixture.
  *
  * Protocol per drain: one untimed warm execution (the streaming
  * machinery JIT-stabilizes on its 2nd-3rd in-JVM run — r14 measured
  * 27.9 → 11.2 → 9.7 s), then 3 timed, compare the MEDIAN (a single
  * co-load blip cannot flip the gate; a real regression moves all
  * three). ~4-6 min wall for the 8 drains at sf0.1. */
object DrainGate {
  def main(args: Array[String]): Unit = {
    val write = args.contains("--write")
    val fixture = java.nio.file.Paths.get("src/test/resources/drain_budgets.tsv")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // mirror Bench's drain isolation defaults so the gate measures
    // the same condition the graded artifact reports
    if (sys.props.get("graft.stream.tmp").isEmpty &&
        sys.env.get("SPARK_GRAFT_STREAM_TMP").isEmpty &&
        java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      sys.props("graft.stream.tmp") = "/dev/shm"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval",
        sys.env.getOrElse("SPARK_GRAFT_MAINT", "1h"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Quiet.muteKnownBenign()
    val drains = graft.SparkEntry.queries.keys.toSeq
      .filter(_.startsWith("q_stream_")).sorted
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val medians = drains.map { name =>
      timeOnce(name) // untimed JIT warm
      val ts = Seq(timeOnce(name), timeOnce(name), timeOnce(name)).sorted
      name -> ts(1)
    }
    if (write) {
      val out = medians.map { case (n, m) =>
        f"$n\t${math.ceil(m * 2).toInt}%d" }.mkString("", "\n", "\n")
      java.nio.file.Files.writeString(fixture, out)
      println(s"wrote ${medians.size} drain budgets (2x measured medians: " +
        medians.map { case (n, m) => f"$n=$m%.2f" }.mkString(", ") + ")")
      spark.stop()
      return
    }
    val budgets = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(fixture).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(n, b) = l.split("\t"); n -> b.toDouble
        }.toMap
    }
    var failed = false
    medians.foreach { case (name, med) =>
      budgets.get(name) match {
        case Some(b) if med > b =>
          println(f"DRAIN OVER BUDGET: $name median $med%.2f s > $b%.1f s budget"); failed = true
        case Some(b) =>
          println(f"drain ok: $name median $med%.2f s <= $b%.1f s budget")
        case None =>
          println(s"DRAIN UNBUDGETED: $name has no row in $fixture — " +
            "run DrainGate --write and review the diff"); failed = true
      }
    }
    val stale = budgets.keySet -- medians.map(_._1).toSet
    if (stale.nonEmpty) {
      println(s"STALE BUDGET ROWS (drain no longer registered): ${stale.mkString(", ")}")
      failed = true
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
