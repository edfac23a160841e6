package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's money-string parse
  * (`/root/reference/dags/silver/dag_silver_financial_sample.py:76-82`):
  * strip `R`, `$`, `,`, whitespace, then parse as double (null on
  * malformed input, matching SQL cast semantics).
  *
  * This is the deliberate custom-`Expression` exhibit (SURVEY.md §4.3):
  * the preference ladder is built-in functions → native Expression →
  * UDF. [[graft.etl.Clean.parseMoney]] composes built-ins
  * (regexp_replace + cast) and stays the default; this expression shows
  * the next rung — `doGenCode` emits a straight-line Java loop into
  * whole-stage codegen with zero regex machinery and no
  * serialization boundary, which is what a Scala UDF would cost on
  * every row of a 100 TB scan. `nullSafeEval` provides the interpreted
  * fallback for non-codegen paths. */
case class ParseMoneyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "parse_money_native"

  override protected def withNewChildInternal(newChild: Expression): ParseMoneyExpr =
    copy(child = newChild)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_money_native requires STRING, got ${child.dataType.catalogString}")

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val cleaned = ParseMoneyExpr.strip(input.asInstanceOf[UTF8String].toString)
    ParseMoneyExpr.parseOrNull(cleaned)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ParseMoneyExpr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      val cleaned = ctx.freshName("cleaned")
      val parsed = ctx.freshName("parsed")
      s"""
         |String $cleaned = $cls.strip($c.toString());
         |Double $parsed = $cls.parseOrNull($cleaned);
         |if ($parsed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $parsed.doubleValue();
         |}
       """.stripMargin
    })
  }
}

object ParseMoneyExpr {

  /** Single-pass strip of `R $ , space tab` — no regex engine. */
  def strip(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch != 'R' && ch != '$' && ch != ',' && !Character.isWhitespace(ch)) sb.append(ch)
      i += 1
    }
    sb.toString
  }

  def parseOrNull(s: String): java.lang.Double =
    if (s.isEmpty) null
    else try java.lang.Double.valueOf(s) catch { case _: NumberFormatException => null }

  /** Column-API entry point. */
  def parseMoneyNative(c: Column): Column =
    Bridge.column(ParseMoneyExpr(Bridge.expression(c)))

  /** Register to the SQL function registry as `parse_money_native`.
    * Once per session — repeat registration is harmless but logs a
    * registry-replacement warning per call. */
  def register(spark: SparkSession): Unit =
    graft.SessionMemo.oncePerSession(spark, "register:parse_money_native") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "parse_money_native", exprs => ParseMoneyExpr(exprs.head), "scala_udf")
    }
}
