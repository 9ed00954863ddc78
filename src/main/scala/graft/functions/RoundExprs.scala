package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Binary-consistent decimal rounding as a single native expression:
  * half away from zero on the binary double —
  * `sign(x) * floor(|x| * 10^d + 0.5) / 10^d`, with floor spelled
  * `f - f % 1.0` so huge values (f ≥ 2^52, where the modulo is exactly
  * 0) round to themselves, and NaN/±Infinity/null pass through.
  *
  * Exactly the arithmetic of the composable `Rounding.round` column
  * formula (bit-identical to the DuckDB oracle), but the child
  * evaluates ONCE: the when/signum/abs/mod spelling references its
  * input ~8 times, which Catalyst substitutes textually — on an
  * expensive input (a 64-dim cosine, a jaccard ratio) that multiplies
  * the real work, and when a filter on the rounded value collapses
  * into a join condition the expansion doubles again.
  */
case class BinaryRoundExpression(child: Expression, digits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"binary_round needs a double input, got ${dt.catalogString}")
  }

  private val scale: Double = math.pow(10, digits)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else {
      val f = math.abs(v) * scale + 0.5
      val fl = f - (f % 1.0)
      math.signum(v) * fl / scale
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val f = ctx.freshName("f")
      val fl = ctx.freshName("fl")
      s"""
         |if (Double.isNaN($c) || Double.isInfinite($c)) {
         |  ${ev.value} = $c;
         |} else {
         |  double $f = Math.abs($c) * ${scale}D + 0.5D;
         |  double $fl = $f - ($f % 1.0D);
         |  ${ev.value} = Math.signum($c) * $fl / ${scale}D;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BinaryRoundExpression =
    copy(child = newChild)

  override def prettyName: String = "binary_round"
}
