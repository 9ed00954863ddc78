package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Punycode/IDN host folding (RFC 3490/3492 via `java.net.IDN`): the
  * canonical ASCII-compatible (ACE) form of a host, so
  * `bücher.example` and `xn--bcher-kva.example` — one logical site,
  * two spellings — fold to ONE key.
  *
  * SPEC-ONLY component (the GraphiteSource/MetricTrie precedent): the
  * RFC 3492 codec is an algorithm, not a DuckDB-expressible column
  * chain, so there is no oracle row — q282's [[graft.ops.UrlOps.idnReport]]
  * stays the oracle-checked surface (it reports WHERE the exposure
  * lives), and [[graft.ops.UrlOps.idnReportFolded]] consumes this fold
  * to verify the flagged families would actually merge. Property specs
  * pin idempotence (fold∘fold ≡ fold), unicode↔punycode equivalence,
  * and the quarantine convention (a host the codec rejects folds to
  * NULL rather than a guess).
  */
object IdnFold {

  /** Lowercase (ROOT locale, the fold is case-insensitive by IDNA
    * nameprep anyway) then ACE-encode; null on anything the codec
    * rejects (empty labels, oversized labels) — quarantine, not guess.
    */
  def fold(raw: String): String =
    try java.net.IDN.toASCII(raw.toLowerCase(java.util.Locale.ROOT))
    catch { case _: Exception => null }

  /** UTF8String entry point for generated code; null propagates. */
  def foldU(raw: UTF8String): UTF8String = {
    val r = fold(raw.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}

/** `punycode_fold(host)` — [[IdnFold.fold]] as a native unary
  * expression: map-only, whole-stage codegen, NULL on codec rejection.
  */
case class PunycodeFoldExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"punycode_fold needs a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    IdnFold.foldU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.IdnFold.foldU($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PunycodeFoldExpression =
    copy(child = newChild)

  override def prettyName: String = "punycode_fold"
}

object PunycodeFold {
  /** Column entry point. */
  def apply(host: Column): Column =
    Bridge.column(PunycodeFoldExpression(Bridge.expression(host)))
}
