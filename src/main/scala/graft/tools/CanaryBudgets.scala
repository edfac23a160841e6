package graft.tools

/** Canary-budget maintenance for the bench's comparable-stamp anchor
  * (r16 verdict #1b; fixture `src/test/resources/canary_budgets.tsv`)
  * — the same deliberate-regen policy as [[DrainGate]]'s drain
  * budgets, but sourced from COMMITTED bench detail artifacts rather
  * than a fresh measuring run: the canary medians must represent the
  * committed steady state the stamp compares against, not whatever
  * this minute's host happens to measure. (The r18 first cut of the
  * freshness gate DID measure fresh in a standalone 5-query session
  * and read 3-6x over budget on every canary — a cold JVM times C2
  * compilation and memo builds, not regressions; full-session
  * steady state only exists inside a full bench leg, so the gate
  * compares against legs instead.)
  *
  * Usage:
  *   runMain graft.tools.CanaryBudgets detail1.json detail2.json ...
  *     — report mode: recompute per-canary medians across the given
  *       artifacts, print measured-vs-fixture slack, exit 1 when a
  *       fixture median drifts outside 2x of the recomputed one in
  *       either direction (stale-tight AND stale-loose).
  *   runMain graft.tools.CanaryBudgets --write detail1.json ...
  *     — rewrite the fixture from the artifacts (review the diff).
  *   runMain graft.tools.CanaryBudgets --check
  *     — freshness gate (r17 verdict #5, dev/gate.sh check 6): the
  *       report-mode comparison against the newest (up to 3)
  *       bench_detail artifacts in the working directory that are
  *       `comparable:true`, full-registry (`mode:"full"` — hygiene
  *       legs legitimately rebuild memo families in timed samples
  *       and must not feed medians), and at this run's sf. Fails
  *       OVER-style drift (2x either way, slack printed per canary,
  *       mirroring DrainGate's self-maintenance) and fails when NO
  *       usable leg exists — run a bench leg first; the round trio
  *       always provides them. Without this, drains had
  *       self-maintaining budgets while the canary anchor could
  *       silently loosen after a speedup.
  *
  * Artifacts must be COMPARABLE legs (`"comparable":true` is
  * enforced). The canary SET comes from the existing fixture (or the
  * built-in default on first run); changing the set is an edit, not
  * a regen. */
object CanaryBudgets {
  private val defaultCanaries = Seq(
    "q_json_fns", "q_image_decode", "q_orc_roundtrip",
    "q_join_salted", "q_bm25")

  private val fixture =
    java.nio.file.Paths.get("src/test/resources/canary_budgets.tsv")

  /** --check: discover usable legs, then run the report comparison. */
  private def check(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (!java.nio.file.Files.exists(fixture)) {
      println(s"CANARY FIXTURE MISSING: $fixture — regen with --write " +
        "from comparable full-registry bench legs")
      sys.exit(1)
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get("."))
    val candidates = try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(f => f.startsWith("bench_detail_") && f.endsWith(".json"))
        .toSeq.sorted
      finally stream.close()
    val usable = candidates.filter { f =>
      try {
        val root = mapper.readTree(java.nio.file.Files.readString(
          java.nio.file.Paths.get(f)))
        root.path("comparable").asBoolean(false) &&
          root.path("sf").asText() == sfDir &&
          root.path("mode").asText() == "full"
      } catch { case _: Exception => false }
    }.takeRight(3) // newest: run-stamped names sort chronologically
    if (usable.isEmpty) {
      println(s"CANARY CHECK HAS NO LEGS: no comparable full-registry " +
        s"bench_detail_*.json at sf=$sfDir in the working directory — " +
        "run a bench leg (the round trio provides them), then re-run")
      sys.exit(1)
    }
    println(s"checking fixture against ${usable.size} legs: " +
      usable.mkString(", "))
    run(usable, write = false)
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--check")) { check(); return }
    val files = args.filterNot(_.startsWith("--")).toSeq
    require(files.nonEmpty,
      "pass at least one committed comparable bench_detail_*.json")
    run(files, write = args.contains("--write"))
  }

  private def run(files: Seq[String], write: Boolean): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val legs = files.map { f =>
      val root = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(f)))
      require(root.path("comparable").asBoolean(false),
        s"$f is not a comparable leg — the stamp's own rules reject it")
      f -> root
    }
    // all artifacts must come from ONE sf (mixed-sf medians are
    // meaningless — budgets are absolute seconds at a specific scale)
    val sfs = legs.map(_._2.path("sf").asText()).distinct
    require(sfs.size == 1, s"artifacts span multiple sfs: $sfs")
    val sf = sfs.head
    // cpus comes from the LEGS, like sf/stream_tmp (r17 ADVICE: the
    // regen host's env could misstate the measured conditions); legs
    // older than r18 don't carry the field — fall back to env with a
    // warning so historic artifacts stay usable.
    val cpus = {
      val fromLegs = legs.flatMap { case (_, root) =>
        val n = root.path("cpus")
        if (n.isMissingNode) None else Some(n.asText())
      }.distinct
      require(fromLegs.size <= 1, s"artifacts span multiple cpus: $fromLegs")
      fromLegs.headOption.getOrElse {
        val env = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
        println(s"WARN: no artifact carries 'cpus' (pre-r18 legs) — " +
          s"stamping provenance from env: cpus=$env")
        env
      }
    }
    val streamTmps = legs.map(_._2.path("stream_tmp").asText()).distinct
    require(streamTmps.size == 1,
      s"artifacts span multiple stream volumes: $streamTmps")
    val existing: Seq[String] =
      if (java.nio.file.Files.exists(fixture)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(fixture).asScala.toSeq
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .map(_.split("\t")(0))
      } else defaultCanaries
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val medians = existing.map { name =>
      val vals = legs.flatMap { case (f, root) =>
        val v = root.path("queries").path(name)
        if (v.isMissingNode) { println(s"WARN: $f has no '$name'"); None }
        else Some(v.asDouble())
      }
      require(vals.nonEmpty, s"no artifact carries canary $name")
      name -> median(vals)
    }
    if (write) {
      val header = s"# provenance: sf=$sf cpus=$cpus stream_tmp=${streamTmps.head}"
      val note = s"# committed steady-state medians (seconds) over ${files.size} " +
        "comparable legs:\n" +
        files.map(f => s"#   $f").mkString("\n") + "\n" +
        "# the bench stamps not_comparable when a graded\n" +
        "# min-of-2 exceeds max(2 x median, 0.5 s). Regenerate via\n" +
        "# `runMain graft.tools.CanaryBudgets --write <comparable details...>`\n" +
        "# and review the diff, like drain_budgets.tsv."
      val rows = medians.map { case (n, m) =>
        f"$n\t$m%.3f" }.mkString("\n")
      java.nio.file.Files.writeString(fixture, s"$header\n$note\n$rows\n")
      println(s"wrote ${medians.size} canary medians from ${files.size} legs: " +
        medians.map { case (n, m) => f"$n=$m%.3f" }.mkString(", "))
      return
    }
    // report mode: fixture vs recomputed, drift-gated both directions.
    // A missing fixture is all-unbudgeted, not a stack trace (r17
    // ADVICE: the unconditional read threw NoSuchFileException here
    // while `existing` above had already handled the same case).
    val committed: Map[String, Double] =
      if (!java.nio.file.Files.exists(fixture)) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(fixture).asScala
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .map { l => val Array(n, b) = l.split("\t"); n -> b.toDouble }.toMap
      }
    var failed = false
    medians.foreach { case (name, fresh) =>
      committed.get(name) match {
        case Some(c) if c > fresh * 2 || fresh > c * 2 =>
          println(f"CANARY MEDIAN DRIFT: $name fixture $c%.3f vs measured " +
            f"$fresh%.3f — regen with --write and review"); failed = true
        case Some(c) =>
          println(f"canary ok: $name fixture $c%.3f vs measured $fresh%.3f " +
            f"(${math.max(c, fresh) / math.min(c, fresh)}%.2fx)")
        case None =>
          println(s"CANARY UNBUDGETED: $name missing from $fixture — " +
            "regen with --write from committed comparable legs"); failed = true
      }
    }
    if (failed) sys.exit(1)
  }
}
