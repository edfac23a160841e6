package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable numerics.
  *
  * The driver hash-compares every query result against a DuckDB oracle
  * (SURVEY.md §5.2), so float aggregates must be bit-identical across
  * two engines AND across any partitioning / aggregation order — plain
  * `sum(double)` is neither (FP addition is not associative). The fix:
  * cast per-row to decimal (deterministic, inputs are money-like with
  * ≤2 dp so the cast is unambiguous), sum exactly in decimal
  * (order-independent), cast the final scalar back to double (exact).
  * The DuckDB twin is `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
  *
  * This is also the right 100 TB design: decimal sums never lose
  * cents, and Spark's partial-aggregation (map-side combine) still
  * applies — decimal sum is algebraic, so the shuffle carries one
  * 16-byte buffer per group, not rows.
  */
object Num {
  private val D = DecimalType(18, 6)

  /** Exact order-independent sum of a money-like double column. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact-sum-based average: decimal sum → double, then one IEEE
    * division — identical in any engine. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(lit(1))

  /** Exact sum kept IN decimal — for intermediates that are
    * re-aggregated downstream (e.g. after a sink round-trip): sum
    * again exactly, cast to double ONCE at the very end. */
  def dsumDec(c: Column): Column = sum(c.cast(D))

  /** DuckDB twins, so Spark-side and oracle-side stay in lockstep. */
  def sqlSumDec(e: String): String = s"SUM(CAST($e AS DECIMAL(18,6)))"
  def sqlSum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlAvg(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"

  /** Portable two-round multiply-mod hash of a non-negative id column
    * — the ONE deterministic sampler/splitter hash, uniform in
    * [0, 2147483629) and identical in both engines (all intermediates
    * stay non-negative and below 2^63 while id < 2^63 / 2654435761 ≈
    * 3.5e9; shard-local ids keep it there). Two rounds with different
    * prime moduli: one affine step stays linear in the id and
    * correlates with id-periodic strata (measured round 2); the mod-p1
    * truncation between rounds breaks the linearity. Spark expr text
    * and DuckDB twin come from the same helper so a constant tweak
    * can never drift one engine. */
  def hashExpr(idCol: String): String =
    s"pmod(pmod(($idCol + 1) * 2654435761, 2147483647) * 2654435761, 2147483629)"
  def sqlHash(idCol: String): String =
    s"(((($idCol + 1) * 2654435761) % 2147483647) * 2654435761) % 2147483629"
}
