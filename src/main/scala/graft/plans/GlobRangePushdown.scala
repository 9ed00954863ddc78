package graft.plans

import graft.functions.GlobMatchExpression
import graft.names.Glob
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Literal, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Optimizer rule making glob filters sargable (SURVEY §4 P2): a
  * `glob_match(name, pat)` predicate whose pattern has a non-empty
  * literal prefix additionally constrains `StartsWith(name, prefix)` —
  * an implied predicate Catalyst pushes into the parquet scan as
  * `StringStartsWith`, giving row-group min/max skipping on the
  * (metric, timestamp)-sorted layout. This is the Spark equivalent of
  * the reference's MergeTree primary-key range read (lexicographic
  * `metric BETWEEN`, `AutoHideService.java:131`): the glob itself can't
  * reach the scan (it's a custom predicate), but its prefix range can.
  *
  * The glob node is marked `rangeDerived` after rewriting, so the rule
  * is a no-op on its own output (optimizer rules run to fixed point).
  */
class GlobRangePushdown extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      var changed = false
      val newCond = f.condition.transformUp {
        case g @ GlobMatchExpression(child, pat, false) =>
          changed = true
          val marked = g.copy(rangeDerived = true)
          val prefix = Glob.literalPrefix(pat)
          if (prefix.nonEmpty)
            And(StartsWith(child, Literal.create(prefix, StringType)), marked)
          else marked
      }
      if (changed) f.copy(condition = newCond) else f
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wires the engine
  * into any SparkSession at build time: the glob range-pushdown rule
  * plus the `glob_match` SQL function. For an already-running session
  * use [[GraftExtensions.enable]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new GlobRangePushdown)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("glob_match"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GlobMatchExpression].getName, "glob_match"),
      graft.functions.functions.globMatchBuilder))
  }
}

object GraftExtensions {
  /** Install the optimizer rule (idempotently) on a live session. */
  def enable(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.functions.registerAll(spark)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[GlobRangePushdown]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new GlobRangePushdown
  }
}
