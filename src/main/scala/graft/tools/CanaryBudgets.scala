package graft.tools

/** Maintenance for the bench's absolute anchor fixtures
  * (`src/test/resources/canary_budgets_<sf>.tsv`, one per anchored
  * sf — parsed by [[graft.BenchRules.loadAnchor]]). r19 widened the
  * anchor from 5 sentinel queries to the FULL registry plus the
  * core/drain aggregate envelope (r18 verdict #1/#3/#5): BENCH_r18
  * ran 1.4-1.6x the committed envelope with q_copurchase at 8.6x and
  * stamped `comparable: true` because none of the six contaminated
  * queries was a sentinel — per-query committed medians for every
  * registered query close that hole, and per-sf fixtures mean the
  * sf0.01 baselines are no longer anchor-free.
  *
  * Medians come from COMMITTED bench detail artifacts, never a fresh
  * standalone measuring run: a cold 5-query JVM times C2 compilation
  * and memo builds, not steady state (measured 3-6x over budget on
  * every canary in r18) — full-session steady state only exists
  * inside a full bench leg.
  *
  * Usage:
  *   runMain graft.tools.CanaryBudgets detail1.json detail2.json ...
  *     — report mode: recompute per-query medians + the envelope
  *       across the given artifacts, print measured-vs-fixture drift,
  *       exit 1 when any fixture median drifts outside 2x of the
  *       recomputed one in either direction (stale-tight AND
  *       stale-loose), when a registered-in-legs query has no budget
  *       row, or when a budget row matches no leg query (stale).
  *   runMain graft.tools.CanaryBudgets --write detail1.json ...
  *     — (re)write the per-sf fixture from the artifacts: one row per
  *       query present in the legs (the full registry — drains
  *       included: drain_budgets.tsv budgets DrainGate's median-of-3
  *       under gate conditions, this fixture budgets the bench's
  *       min-of-2 under leg conditions), plus the envelope header.
  *       Review the diff, same policy as drain_budgets.tsv.
  *   runMain graft.tools.CanaryBudgets --check
  *     — freshness gate (dev/gate.sh check 6): report-mode comparison
  *       against the newest (up to 3) full-registry usable bench
  *       legs in the working directory at this run's sf. Fails when
  *       no usable leg exists — run a bench leg first.
  *
  * Artifacts must be usable legs: `"comparable":true`, OR a run whose
  * ONLY not_comparable reasons carry the "anchor" prefix (the
  * bootstrap case — the first legs at a newly anchored sf cannot
  * stamp comparable before a fixture exists, and the fixture cannot
  * be written from comparable legs; a leg that failed only the
  * anchor-presence rule passed every environmental rule). */
object CanaryBudgets {
  private def fixtureFor(sf: String) = graft.BenchRules.fixturePath(sf)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** comparable, or failed ONLY the anchor-presence rule. */
  private def legUsable(root: com.fasterxml.jackson.databind.JsonNode): Boolean =
    root.path("comparable").asBoolean(false) || {
      val nc = root.path("not_comparable")
      import scala.jdk.CollectionConverters._
      nc.isArray && nc.size() > 0 &&
        nc.elements().asScala.forall(_.asText().startsWith("anchor"))
    }

  /** --check: discover usable legs at this sf, then run the report. */
  private def check(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (!java.nio.file.Files.exists(fixtureFor(sfDir))) {
      println(s"CANARY FIXTURE MISSING: ${fixtureFor(sfDir)} — regen with " +
        "--write from full-registry bench legs at this sf")
      sys.exit(1)
    }
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get("."))
    val candidates = try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(f => f.startsWith("bench_detail_") && f.endsWith(".json"))
        .toSeq.sorted
      finally stream.close()
    // the fixture's provenance cpus bounds which legs may feed the
    // freshness check (r20): an 8-cpu scaling leg is an honest leg
    // but its absolute seconds are not this fixture's condition
    val fixtureCpus = graft.BenchRules.loadAnchor(sfDir)
      .toOption.flatMap(_.cpus)
    val usable = candidates.filter { f =>
      try {
        val root = mapper.readTree(java.nio.file.Files.readString(
          java.nio.file.Paths.get(f)))
        legUsable(root) && root.path("sf").asText() == sfDir &&
          root.path("mode").asText() == "full" &&
          fixtureCpus.forall(c => root.path("cpus").isMissingNode ||
            root.path("cpus").asText() == c) &&
          // a leg whose REPLAYED aggregate envelope trips under the
          // current anchor is a recorded false-clean (BENCH_r18
          // stamped comparable:true at core 1.47x — the very
          // artifact this round's rules exist to reject) and must
          // not feed the freshness medians; a genuinely regressed
          // tree fails here with no usable legs, which is the loud
          // outcome a 1.4x slowdown deserves
          StampReplay.replay(f).envelope.isEmpty
      } catch { case _: Exception => false }
    }.takeRight(3) // newest: run-stamped names sort chronologically
    if (usable.isEmpty) {
      println(s"CANARY CHECK HAS NO LEGS: no usable full-registry " +
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
      "pass at least one committed usable bench_detail_*.json")
    run(files, write = args.contains("--write"))
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def run(files: Seq[String], write: Boolean): Unit = {
    val legs = files.map { f =>
      val root = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(f)))
      require(legUsable(root),
        s"$f is not a usable leg (neither comparable nor anchor-bootstrap) " +
          "— the stamp's own rules reject it")
      f -> root
    }
    // all artifacts must come from ONE sf (mixed-sf medians are
    // meaningless — budgets are absolute seconds at a specific scale)
    val sfs = legs.map(_._2.path("sf").asText()).distinct
    require(sfs.size == 1, s"artifacts span multiple sfs: $sfs")
    val sf = sfs.head
    val fixture = fixtureFor(sf)
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
    // per-query values across legs (a query missing from SOME legs —
    // added mid-round — gets the median of the legs that carry it)
    import scala.jdk.CollectionConverters._
    val perQuery = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    legs.foreach { case (_, root) =>
      root.path("queries").fields().asScala.foreach { e =>
        perQuery.getOrElseUpdate(e.getKey,
          scala.collection.mutable.ArrayBuffer[Double]()) += e.getValue.asDouble()
      }
    }
    val medians = perQuery.toSeq
      .map { case (n, vs) => n -> median(vs.toSeq.filter(_ >= 0)) }
      .filter(_._2 > 0).sortBy(_._1)
    val coreEnv = median(legs.map(_._2.path("core_sec").asDouble()))
    val drainEnv = median(legs.map(_._2.path("drain_sec").asDouble()))
    if (write) {
      val header =
        s"# provenance: sf=$sf cpus=$cpus stream_tmp=${streamTmps.head}"
      val envelope = "# envelope: core_sec=" +
        graft.BenchRules.r3(coreEnv) + " drain_sec=" +
        graft.BenchRules.r3(drainEnv)
      val note = s"# committed steady-state medians (seconds) over " +
        s"${files.size} usable legs:\n" +
        files.map(f => s"#   $f").mkString("\n") + "\n" +
        "# the bench stamps not_comparable when a graded min-of-2\n" +
        s"# exceeds max(2 x median, ${graft.BenchRules.CanaryFloor} s) or core_sec/drain_sec exceeds\n" +
        "# 1.3 x the envelope. Regenerate via\n" +
        "# `runMain graft.tools.CanaryBudgets --write <usable details...>`\n" +
        "# and review the diff, like drain_budgets.tsv."
      val rows = medians.map { case (n, m) =>
        s"$n\t${graft.BenchRules.r3(m)}" }.mkString("\n")
      java.nio.file.Files.writeString(fixture,
        s"$header\n$envelope\n$note\n$rows\n")
      println(s"wrote ${medians.size} query medians + envelope " +
        s"(core ${graft.BenchRules.r3(coreEnv)} / drain " +
        s"${graft.BenchRules.r3(drainEnv)}) from ${files.size} legs to $fixture")
      return
    }
    // report mode: fixture vs recomputed, drift-gated both directions
    val anchor = graft.BenchRules.loadAnchor(sf) match {
      case Right(a) => a
      case Left(reason) => println(s"CANARY FIXTURE UNUSABLE: $reason — " +
        "regen with --write"); sys.exit(1); return
    }
    var failed = false
    var worstDrift = 1.0; var worstName = ""
    val measured = medians.toMap
    medians.foreach { case (name, fresh) =>
      anchor.budgets.get(name) match {
        case Some(c) if c > fresh * 2 || fresh > c * 2 =>
          println(f"CANARY MEDIAN DRIFT: $name fixture $c%.3f vs measured " +
            f"$fresh%.3f — regen with --write and review"); failed = true
        case Some(c) =>
          val drift = math.max(c, fresh) / math.max(math.min(c, fresh), 1e-9)
          if (drift > worstDrift) { worstDrift = drift; worstName = name }
        case None =>
          println(s"CANARY UNBUDGETED: $name missing from $fixture — " +
            "regen with --write from committed usable legs"); failed = true
      }
    }
    val stale = anchor.budgets.keySet -- measured.keySet
    if (stale.nonEmpty) {
      println(s"CANARY BUDGET ROWS STALE (query no longer in any leg): " +
        s"${stale.toSeq.sorted.mkString(", ")}"); failed = true
    }
    Seq(("core_sec", anchor.coreEnvelope, coreEnv),
        ("drain_sec", anchor.drainEnvelope, drainEnv)).foreach {
      case (k, c, fresh) =>
        if (c > fresh * 2 || fresh > c * 2) {
          println(f"CANARY ENVELOPE DRIFT: $k fixture $c%.3f vs measured " +
            f"$fresh%.3f — regen with --write"); failed = true
        }
    }
    if (!failed)
      println(f"canary ok: ${anchor.budgets.size}%d budgets fresh vs " +
        f"${files.size}%d legs (worst drift $worstDrift%.2fx $worstName; " +
        f"envelope core ${coreEnv / anchor.coreEnvelope}%.2fx drain " +
        f"${drainEnv / anchor.drainEnvelope}%.2fx)")
    if (failed) sys.exit(1)
  }
}
