package graft.functions

import graft.names.Glob
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst predicate for Graphite glob matching (SURVEY §2.10
  * E3, reference `search/tree/MetricTree.java:226-239` semantics):
  * `glob_match(name, 'a.*.c{x,y}')`. The glob is translated and the
  * regex compiled ONCE at planning time; `doGenCode` emits a direct
  * `Matcher.matches()` call inside whole-stage codegen — no per-row
  * pattern work and no UDF serialization, which is what makes it usable
  * as a scan filter over billions of metric names.
  *
  * An invalid glob matches nothing (reference behavior: invalid pattern
  * ⇒ empty result, not an error) — the expression folds to constant
  * false.
  */
/** @param rangeDerived set by [[graft.plans.GlobRangePushdown]] once the
  *   sargable prefix predicate has been derived for this node, so the
  *   rule is idempotent across optimizer fixed-point iterations.
  */
case class GlobMatchExpression(child: Expression, globPattern: String,
                               rangeDerived: Boolean = false)
    extends UnaryExpression with Predicate {

  @transient private lazy val compiled: Option[java.util.regex.Pattern] =
    Glob.queryToRegex(globPattern).map(java.util.regex.Pattern.compile)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"glob_match needs a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = compiled match {
    case Some(p) => p.matcher(input.asInstanceOf[UTF8String].toString).matches()
    case None    => false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    compiled match {
      case Some(p) =>
        // one Pattern object per plan, referenced from generated code
        val patternRef = ctx.addReferenceObj("globPattern", p, classOf[java.util.regex.Pattern].getName)
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $patternRef.matcher($c.toString()).matches();")
      case None =>
        nullSafeCodeGen(ctx, ev, _ => s"${ev.value} = false;")
    }

  override protected def withNewChildInternal(newChild: Expression): GlobMatchExpression =
    copy(child = newChild)

  override def prettyName: String = "glob_match"
}

/** Column/SQL entry points for the graft-specific functions. */
object functions {

  /** Graphite glob predicate over a string column. */
  def glob_match(name: Column, glob: String): Column =
    Bridge.column(GlobMatchExpression(Bridge.expression(name), glob))

  /** The ONE SQL function builder, shared by [[registerAll]] and
    * `plans.GraftExtensions` so both registration paths behave
    * identically.
    */
  val globMatchBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "glob_match(col, 'pattern')")
    val pattern = exprs(1) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"glob_match pattern must be a string literal, got $other")
    }
    GlobMatchExpression(exprs.head, pattern)
  }

  /** Register `glob_match(col, 'pattern')` for SQL use on this session. */
  def registerAll(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "glob_match", globMatchBuilder, "built-in")
}
