package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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
  * costs extra candidate pairs, never correctness. */
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

object BinRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

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
        val seq = new Sequence(bin(g.right, w), bin(l.right, w), Some(Literal(1L)))
          .withTimeZone(conf.sessionLocalTimeZone)
        val gen = Generate(Explode(seq), Nil, outer = false, None, Seq(rBin), right)
        val newCond = (EqualTo(lBin.toAttribute, rBin) +: residual).reduce(And)
        Project(j.output, Join(newLeft, gen, Inner, Some(newCond), hint))
      }
      rewritten.getOrElse(j)
  }
}
