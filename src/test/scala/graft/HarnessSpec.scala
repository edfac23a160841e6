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

  test("canary_budgets.tsv names registered non-drain queries and carries provenance") {
    // the bench adjudicates its comparable stamp against this fixture
    // (r16 verdict #1b) — a renamed canary would silently weaken the
    // anchor (the bench's resultMap lookup misses and the rule never
    // trips), so pin fixture/registry consistency at suite time like
    // the drain budgets above
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("src/test/resources/canary_budgets.tsv"))
      .asScala.filter(_.nonEmpty).toSeq
    assert(lines.exists(_.startsWith("# provenance:")),
      "canary fixture must carry a provenance header (sf=..., cpus=...)")
    val canaries = lines.filterNot(_.startsWith("#")).map(_.split("\t")(0))
    assert(canaries.nonEmpty && canaries.size >= 5)
    canaries.foreach { c =>
      assert(SparkEntry.queries.contains(c), s"canary $c is not a registered query")
      assert(!c.startsWith("q_stream_"),
        s"canary $c is a drain — drains are budgeted by DrainGate, not the bench stamp")
    }
  }
}
