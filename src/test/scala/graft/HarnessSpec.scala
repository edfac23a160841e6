package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-harness compatibility invariants. The driver's checker loads
  * each query's parquet with pandas and sorts over ALL columns before
  * hashing — a column whose cells are numpy arrays / dicts makes that
  * sort throw (`unhashable type`), which cost two queries in round 1.
  * These checks pin the contract so it can't regress silently. */
class HarnessSpec extends SparkSpec {

  test("every query output column is an atomic (pandas-sortable) type") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val schema = fn(spark, sfDir).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
               || f.dataType.isInstanceOf[MapType]
               || f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"nested-typed output columns break the driver's pandas sorter: ${offenders.mkString(", ")}")
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL with no query: ${orphans.mkString(", ")}")
  }

  test("drain_budgets.tsv names exactly the registry's q_stream_* drains") {
    // the gate's DrainGate run discovers a mismatch too, but only
    // after actually draining — this pins the fixture/registry
    // consistency at suite time (a renamed or added drain with no
    // budget row must fail fast, same convention as the census
    // fixture's doc-count check)
    import scala.jdk.CollectionConverters._
    val budgeted = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("src/test/resources/drain_budgets.tsv"))
      .asScala.filter(l => l.nonEmpty && !l.startsWith("#")) // skip provenance header
      .map(_.split("\t")(0)).toSet
    val drains = SparkEntry.queries.keySet.filter(_.startsWith("q_stream_"))
    assert(budgeted == drains,
      s"unbudgeted drains: ${(drains -- budgeted).mkString(", ")}; " +
        s"stale budget rows: ${(budgeted -- drains).mkString(", ")} — " +
        "run `sbt \"runMain graft.tools.DrainGate --write\"` and review the diff")
  }

  test("canary budget fixtures cover the FULL registry per anchored sf") {
    // the bench adjudicates its comparable stamp against these
    // fixtures (r16 verdict #1b, widened to the full registry + the
    // aggregate envelope by r18 verdict #1/#3/#5 after BENCH_r18
    // false-cleaned: 5 sentinels missed all six contaminated
    // queries). A renamed or added query with no budget row silently
    // weakens the anchor, so pin EXACT fixture/registry equality at
    // suite time for every anchored sf, same convention as the drain
    // budgets above. Registry changes therefore require a fresh leg
    // per anchored sf + `CanaryBudgets --write` — that is the point:
    // an sf either has a complete absolute anchor or fails loudly.
    import scala.jdk.CollectionConverters._
    val fixtures = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get("src/test/resources"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(f => f.startsWith("canary_budgets_") && f.endsWith(".tsv"))
        .toSeq.sorted
      finally s.close()
    }
    assert(fixtures.size >= 2,
      s"expected anchored fixtures for at least sf0.1 and sf0.01, found: $fixtures")
    fixtures.foreach { f =>
      val lines = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get("src/test/resources", f))
        .asScala.filter(_.nonEmpty).toSeq
      assert(lines.exists(_.startsWith("# provenance:")),
        s"$f must carry a provenance header (sf=..., cpus=...)")
      assert(lines.exists(_.startsWith("# envelope:")),
        s"$f must carry the core_sec/drain_sec envelope header")
      // the provenance sf must round-trip through BenchRules' path
      // derivation — a fixture named for one sf but stamped for
      // another would never be loaded by the bench
      val sfTok = lines.find(_.startsWith("# provenance:")).get
        .split("\\s+").find(_.startsWith("sf=")).map(_.stripPrefix("sf="))
      assert(sfTok.exists(sf =>
          BenchRules.fixturePath(sf).getFileName.toString == f),
        s"$f provenance sf=$sfTok does not derive this fixture's name")
      val budgeted = lines.filterNot(_.startsWith("#"))
        .map(_.split("\t")(0)).toSet
      assert(budgeted == SparkEntry.queries.keySet,
        s"$f: unbudgeted queries: " +
          s"${(SparkEntry.queries.keySet -- budgeted).toSeq.sorted.take(5).mkString(", ")}; " +
          s"stale rows: ${(budgeted -- SparkEntry.queries.keySet).toSeq.sorted.take(5).mkString(", ")} — " +
          "run a bench leg at that sf, then " +
          "`sbt \"runMain graft.tools.CanaryBudgets --write <legs...>\"`")
    }
  }
}
