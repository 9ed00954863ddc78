package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compression ratio of a text column: compressed bytes / raw
  * bytes (1.0 for empty text). Highly repetitive or templated content
  * compresses far below natural prose (~0.4-0.6), making this the
  * classic cheap quality/repetition signal alongside the token-level
  * ratios in `TextOps.repetitionFrame`.
  *
  * Implemented as a native expression whose codegen calls a static
  * helper with a thread-local `Deflater` (BEST_SPEED) — no per-row
  * allocation of compressor state, no UDF serialization. The cost IS
  * the deflate pass itself (~30-60 MB/s/core) — budget it like a hash
  * of the full text, and prefer sampling (`SampleOps.deterministicKeep`)
  * when the signal is only needed on a corpus subset.
  *
  * No DuckDB oracle exists for deflate output, so this operator is
  * spec-gated (value-range and monotonicity checks), not hash-gated.
  */
case class CompressionRatioExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"compression_ratio needs a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    CompressExprs.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressExprs.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatioExpression =
    copy(child = newChild)

  override def prettyName: String = "compression_ratio"
}

object CompressExprs {

  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED))

  /** compressedBytes/rawBytes of the UTF-8 text; 1.0 for empty input. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / raw.length
  }

  /** Codegen'd deflate-compression ratio of a string column. */
  def compressionRatio(text: Column): Column =
    Bridge.column(CompressionRatioExpression(Bridge.expression(text)))
}
