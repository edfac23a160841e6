package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Whole-operator Catalyst extension: automatic binning of
  * point-in-interval (range) joins.
  *
  * A join on `fact.x >= dim.lo AND fact.x < dim.hi` has no equi key,
  * so Spark plans a nested-loop join — O(|fact| × |dim|) comparisons,
  * the scale cliff q_join_range_binned works around BY HAND (overlap
  * intervals with fixed-width bins, equi-join on the bin id, keep the
  * exact predicate as a residual filter). This module performs that
  * rewrite IN THE OPTIMIZER, so a user writes the natural theta join
  * and still gets the binned plan:
  *
  *   - [[BinWidthHint]] — a non-foldable boolean hint expression the
  *     query AND-s into its join condition, carrying the bin width.
  *     It references both join sides, so no optimizer rule can push
  *     it out of the condition, and it evaluates to `true`, so an
  *     extension-less session runs the query unchanged (same results,
  *     nested-loop plan). Plan-scoped activation — no session conf to
  *     leak into other queries' plans.
  *   - [[BinRangeJoin]] — the `Rule[LogicalPlan]` that finds an inner
  *     join whose condition carries the hint plus a `>= / <` pair
  *     probing one side against interval bounds from the other, and
  *     rewrites: project `floor(x / w)` on the probe side, `explode(
  *     sequence(floor(lo / w), floor(hi / w)))` on the interval side,
  *     equi-join on the bin id with the original predicate residual.
  *
  * Registration: `class GraftExtensions` injects it (config
  * `spark.sql.extensions=graft.plans.GraftExtensions`), or live via
  * `spark.experimental.extraOptimizations` — both exercised by
  * PlanSpec / q_join_range_auto.
  *
  * Scale judgment: the rewrite turns O(|fact| × |dim|) into
  * O(|fact| + Σ interval_width / w) shuffle-or-broadcast work; the
  * residual filter keeps semantics exact, so a too-coarse width only
  * costs extra candidate pairs, never correctness. A too-FINE width is
  * guarded: empty intervals (lo > hi — always-false in the original
  * predicate) explode to an empty bin array instead of tripping
  * Sequence's illegal-boundaries check, and any interval wider than
  * [[BinRangeJoin.MaxBinsPerInterval]] bins fails fast with a message
  * naming the fix (larger width / drop the hint) instead of
  * materializing a multi-gigabyte per-row array. */
case class BinWidthHint(width: Expression, probe: Expression, bound: Expression)
    extends TernaryExpression with Predicate with CodegenFallback {
  // references both join sides (probe: fact, bound: dim) so predicate
  // pushdown can never strip the hint out of the join condition
  override def first: Expression = width
  override def second: Expression = probe
  override def third: Expression = bound
  override def nullable: Boolean = false
  // never constant-folded away before the optimizer rule sees it
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(width = newFirst, probe = newSecond, bound = newThird)
}

object BinWidthHint {
  /** Column-API entry: `fact.join(dim, x >= lo && x < hi && binWidth(50000, x, lo))`. */
  def binWidth(w: Double, probe: Column, bound: Column): Column =
    Bridge.column(BinWidthHint(Literal(w, DoubleType),
      Bridge.expression(probe), Bridge.expression(bound)))
}

/** Runtime guard for the binned-interval explode: evaluated only when
  * an interval spans more bins than the rewrite is willing to
  * materialize. Throws with the interval's actual bin count and the
  * two remedies, instead of letting Spark hit the array-length cap or
  * an executor OOM with no hint of the cause. Declared array-typed so
  * it can sit in the error branch of the `If` around [[Sequence]]. */
case class BinCapError(binLo: Expression, binHi: Expression, cap: Long)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = binLo
  override def right: Expression = binHi
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val lo = binLo.eval(input).asInstanceOf[Long]
    val hi = binHi.eval(input).asInstanceOf[Long]
    // hi - lo itself can overflow Long (±Infinity bounds floor to
    // Long.Min/MaxValue) — report the span overflow-safely
    val span =
      try String.valueOf(Math.addExact(Math.subtractExact(hi, lo), 1L))
      catch { case _: ArithmeticException => "more than 2^63" }
    throw new IllegalStateException(
      s"BinWidthHint: one interval spans $span bins " +
        s"(bin $lo..$hi, cap $cap). The bin width is too small for this " +
        "interval — raise the width in binWidth(...), or drop the hint " +
        "to keep the nested-loop join for this query.")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(binLo = newLeft, binHi = newRight)
}

/** Overflow-safe span-within-cap predicate: true iff the interval
  * spans at most `cap` bins. A plain `Subtract(binHi, binLo)` wraps on
  * Long overflow (e.g. a -Infinity bound bins to Long.MinValue, +Inf
  * to Long.MaxValue), and the wrapped small value would slip past the
  * cap check and die in Sequence's opaque 'too long sequence' error —
  * exactly the failure the cap exists to replace. `Math.subtractExact`
  * turns that wrap into an exception, which we read as over-cap.
  * CodegenFallback is fine here: it runs once per interval (dim) row,
  * never on the fact side. */
case class BinSpanWithinCap(binLo: Expression, binHi: Expression, cap: Long)
    extends BinaryExpression with Predicate with CodegenFallback {
  override def left: Expression = binLo
  override def right: Expression = binHi
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val lo = binLo.eval(input).asInstanceOf[Long]
    val hi = binHi.eval(input).asInstanceOf[Long]
    try Math.subtractExact(hi, lo) <= cap - 1
    catch { case _: ArithmeticException => false }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(binLo = newLeft, binHi = newRight)
}

object BinRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Hard per-interval bin cap: 1M bins ≈ an 8 MB long array per dim
    * row — already pathological; anything past it is a mis-set width,
    * not a workload. */
  val MaxBinsPerInterval: Long = 1L << 20

  private def numeric(t: DataType): Boolean =
    t.isInstanceOf[org.apache.spark.sql.types.NumericType]

  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) if cond.exists {
        case _: BinWidthHint => true; case _ => false } =>
      val conj = splitConjunctivePredicates(cond)
      val rewritten = for {
        h <- conj.collectFirst { case h: BinWidthHint => h }
        // non-positive width would floor NaN/Infinity bins — leave the
        // join untouched rather than corrupt it
        w <- h.width match {
          case Literal(v: Double, DoubleType) if v > 0.0 => Some(v); case _ => None }
        g <- conj.collectFirst {
          case g @ GreaterThanOrEqual(x, lo)
            if numeric(x.dataType) && numeric(lo.dataType) &&
               x.references.nonEmpty && x.references.subsetOf(left.outputSet) &&
               lo.references.nonEmpty && lo.references.subsetOf(right.outputSet) => g }
        l <- conj.collectFirst {
          case l @ LessThan(x2, hi)
            if x2.semanticEquals(g.left) &&
               numeric(hi.dataType) &&
               hi.references.nonEmpty && hi.references.subsetOf(right.outputSet) => l }
      } yield {
        val residual = conj.filterNot(c => c.semanticEquals(h))
        val lBin = Alias(bin(g.left, w), "graft_bin")()
        val newLeft = Project(left.output :+ lBin, left)
        val rBin = AttributeReference("graft_bin_r", LongType, nullable = false)()
        // Sequence is TimeZoneAwareExpression: without an explicit zone
        // it is UNRESOLVED and the optimizer's plan-integrity validation
        // rejects the rewrite (integer sequences never use it, but
        // resolution still demands one)
        val (binLo, binHi) = (bin(g.right, w), bin(l.right, w))
        val seq = new Sequence(binLo, binHi, Some(Literal(1L)))
          .withTimeZone(conf.sessionLocalTimeZone)
        // Two runtime guards around the explode (bin exprs are LongType,
        // so the comparisons type-check regardless of the bound types):
        //  * null or empty interval (null bound, or lo > hi): the
        //    original predicate is null-or-false there, so emit zero
        //    bins — Sequence itself would throw 'Illegal sequence
        //    boundaries' on lo > hi, and a bare GreaterThan evaluates
        //    null on null bounds, which If routes into the WRONG
        //    (cap-error) branch. IsNull folds nulls into the empty
        //    branch explicitly. Note lo > hi within ONE bin still
        //    yields that single bin; the residual filter kills any
        //    matches, so semantics hold either way.
        //  * oversized interval (> MaxBinsPerInterval, e.g. hi = +Inf
        //    or a mis-set tiny width): fail fast with the remedy
        //    instead of materializing the array. The span check is
        //    overflow-safe (BinSpanWithinCap) — a wrapped Subtract
        //    would let a ±Infinity-bound interval past the cap.
        val guarded = If(
          Or(IsNull(binLo), Or(IsNull(binHi), GreaterThan(binLo, binHi))),
          Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)),
          If(
            BinSpanWithinCap(binLo, binHi, MaxBinsPerInterval),
            seq,
            BinCapError(binLo, binHi, MaxBinsPerInterval)))
        val gen = Generate(Explode(guarded), Nil, outer = false, None, Seq(rBin), right)
        val newCond = (EqualTo(lBin.toAttribute, rBin) +: residual).reduce(And)
        Project(j.output, Join(newLeft, gen, Inner, Some(newCond), hint))
      }
      rewritten.getOrElse(j)
  }
}
