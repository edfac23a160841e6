package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for squared L2 distance over
  * `array<double>` — the hot kernel of the IVF assignment passes
  * (every Lloyd iteration and the final cell assignment score
  * |vectors| × |centroids| pairs).
  *
  * Unlike [[DotProductExpr]] (the float throughput kernel), this one
  * is ORACLE-SAFE: it accumulates `(a[i]-b[i])²` left-to-right in
  * double, the exact IEEE operation sequence of the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +)` and of
  * DuckDB's `LIST_REDUCE(LIST_TRANSFORM(...))` twin — bit-identical
  * results, so swapping it under q_ann_ivf changes no oracle output,
  * it only moves the loop from interpreted lambda dispatch into
  * whole-stage codegen. */
case class L2DistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_dist"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistExpr =
    copy(left = newLeft, right = newRight)

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_dist requires two ARRAY<DOUBLE>, got ${left.dataType.catalogString} " +
          s"and ${right.dataType.catalogString}")

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      // length mismatch -> NULL (same contract as dot_f): a truncated
      // vector must surface, not score as a plausible near neighbor
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

object L2DistExpr {
  /** Column-API entry point. */
  def l2Dist(a: Column, b: Column): Column =
    Bridge.column(L2DistExpr(Bridge.expression(a), Bridge.expression(b)))
}
