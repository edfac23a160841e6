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
}
