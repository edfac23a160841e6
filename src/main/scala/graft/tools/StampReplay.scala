package graft.tools

/** Offline re-adjudication of recorded bench artifacts under the
  * CURRENT stamp rules (r19): replays [[graft.BenchRules]] — the
  * full-registry per-query anchor, the degraded rule with its
  * median-capped reference, the aggregate envelope — plus the
  * recorded probe fields against today's [[graft.Probes]] lines,
  * over any `bench_detail_*.json`.
  *
  * This is the exhibit for the r18 verdict's top ask: BENCH_r18
  * (`bench_detail_20260816T232752Z_29155.json`, committed) stamped
  * `comparable: true` at 1.4-1.6x the committed envelope; replaying
  * it through these rules names its six contaminated queries and
  * fails three rules at once. `BenchStampSpec` pins exactly that,
  * forever. No Spark session — pure JSON + fixture arithmetic, so it
  * runs in milliseconds and cannot disturb a live leg.
  *
  * Usage: runMain graft.tools.StampReplay <bench_detail.json> ...
  * Exit 1 if ANY given artifact trips a rule (regardless of what its
  * recorded stamp said — recorded remediation has already spliced the
  * published `queries`, so a remediated-comparable artifact replays
  * clean by construction). */
object StampReplay {
  final case class Replay(
      file: String,
      canaryOver: Seq[String],
      degraded: Seq[String],
      envelope: Seq[String],
      probeTrips: Seq[String],
      anchorProblem: Option[String]) {
    def tripped: Boolean = canaryOver.nonEmpty || degraded.nonEmpty ||
      envelope.nonEmpty || probeTrips.nonEmpty || anchorProblem.isDefined
  }

  /** Pure replay of one parsed artifact — shared with BenchStampSpec. */
  def replay(file: String): Replay = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(file)))
    import scala.jdk.CollectionConverters._
    def numMap(field: String): Map[String, Double] =
      root.path(field).fields().asScala
        .map(e => e.getKey -> e.getValue.asDouble()).toMap
    val queries = numMap("queries")
    val firstRun = numMap("first_run")
    val sf = root.path("sf").asText()
    graft.BenchRules.loadAnchor(sf) match {
      case Left(reason) =>
        Replay(file, Nil, Nil, Nil, Nil, Some(reason))
      case Right(anchor) =>
        // cpu-provenance gate (r20, mirrors Bench): the anchor's
        // absolute seconds only adjudicate legs recorded at the
        // fixture's core count — a compute-bound query legitimately
        // runs ~4x its 32-cpu median on an 8-cpu scaling leg.
        // Artifacts without a cpus field (pre-r18) apply, as before.
        val legCpus = root.path("cpus")
        val applies = legCpus.isMissingNode ||
          graft.BenchRules.anchorAppliesTo(anchor, legCpus.asText())
        val budgets =
          if (applies) anchor.budgets else Map.empty[String, Double]
        val over = graft.BenchRules.canaryOver(budgets, queries)
        val degraded = queries.toSeq.sortBy(_._1).collect {
          case (n, v) if graft.BenchRules.looksDegraded(v,
            firstRun.getOrElse(n, -1.0), budgets.get(n)) => n
        }
        val envelope =
          if (!applies) Nil
          else graft.BenchRules.envelopeOver(
            root.path("core_sec").asDouble(),
            root.path("drain_sec").asDouble(), anchor)
        // recorded probe fields vs today's lines; fields absent from
        // older artifacts (calib_par_* pre-r19) are skipped, and -1
        // means unknown-by-design
        val probeLines = Seq(
          ("calib_start_s", graft.Probes.CalibLine),
          ("calib_mid_s", graft.Probes.CalibLine),
          ("calib_end_s", graft.Probes.CalibLine),
          ("calib_par_start_s", graft.Probes.CalibParLine),
          ("calib_par_mid_s", graft.Probes.CalibParLine),
          ("calib_par_end_s", graft.Probes.CalibParLine),
          ("io_probe_start_s", graft.Probes.IoLine),
          ("io_probe_mid_s", graft.Probes.IoLine),
          ("io_probe_end_s", graft.Probes.IoLine),
          ("data_probe_start_s", graft.Probes.DataLine),
          ("data_probe_mid_s", graft.Probes.DataLine),
          ("data_probe_end_s", graft.Probes.DataLine),
          ("loadavg_start", 1.5))
        val probeTrips = probeLines.collect {
          case (k, line) if !root.path(k).isMissingNode &&
            root.path(k).asDouble() > line =>
            s"$k ${graft.BenchRules.r3(root.path(k).asDouble())} > $line"
        }
        Replay(file, over, degraded, envelope, probeTrips, None)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass at least one bench_detail_*.json")
    var anyTripped = false
    args.foreach { f =>
      val r = replay(f)
      val verdict = if (r.tripped) "WOULD NOT STAMP comparable" else "clean"
      println(s"$f: $verdict")
      r.anchorProblem.foreach(p => println(s"  anchor: $p"))
      if (r.canaryOver.nonEmpty)
        println(s"  canary over (${r.canaryOver.size}): " +
          r.canaryOver.mkString("; "))
      if (r.degraded.nonEmpty)
        println(s"  degraded-by-median-ref: ${r.degraded.mkString(", ")}")
      if (r.envelope.nonEmpty)
        println(s"  envelope: ${r.envelope.mkString("; ")}")
      if (r.probeTrips.nonEmpty)
        println(s"  probes: ${r.probeTrips.mkString("; ")}")
      anyTripped ||= r.tripped
    }
    if (anyTripped) sys.exit(1)
  }
}
