package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass SimHash over a token array.
  *
  * Replaces the explode → md5-per-token → 16-sum aggregation pipeline
  * (a digest per token plus a full-corpus shuffle keyed by doc id)
  * with a single pass per document: each token gets a base-31
  * polynomial hash mod 2^32 — tokens are ASCII (`[a-z0-9_']` runs), so
  * byte values are char codes and the identical fold is expressible in
  * the DuckDB oracle as `list_reduce(... (a*31+c) % 4294967296)` —
  * and votes ±1 per bit position; positive-vote bits pack into the
  * result. Map-only: signature computation no longer shuffles at all.
  *
  * An empty or null token array yields NULL (such documents produced
  * no rows in the explode pipeline — callers filter nulls to keep that
  * contract). A null ELEMENT cannot occur in `TextOps.tokens` output
  * and is skipped defensively.
  */
object SimHashCodes extends Serializable {

  /** Base-31 polynomial hash of the token's bytes, mod 2^32. */
  def polyHash(t: UTF8String): Long = {
    val bytes = t.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) & 0xffffffffL
      i += 1
    }
    h
  }

  /** SimHash of a token array; MinValue sentinel encodes NULL (empty
    * input) so the codegen helper can stay a plain long function.
    */
  val NullSentinel: Long = Long.MinValue

  def simHash(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    if (n == 0) return NullSentinel
    val votes = new Array[Int](bits)
    var i = 0
    var any = false
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = polyHash(arr.getUTF8String(i))
        var k = 0
        while (k < bits) {
          if (((h >> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    if (!any) return NullSentinel
    var packed = 0L
    var k = 0
    while (k < bits) {
      if (votes(k) > 0) packed |= 1L << k
      k += 1
    }
    packed
  }
}

/** `simhash(tokens, bits)` → bigint SimHash; NULL for empty input. */
case class SimHashExpression(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"simhash needs 1 <= bits <= 63, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash needs an array<string> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = SimHashCodes.simHash(input.asInstanceOf[ArrayData], bits)
    if (v == SimHashCodes.NullSentinel) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SimHashCodes.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $helper.simHash($c, $bits);
         |if (${ev.value} == ${SimHashCodes.NullSentinel}L) { ${ev.isNull} = true; ${ev.value} = -1L; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

object SimHashExprs {
  /** One-pass SimHash of a token-array column. */
  def simHash(tokens: Column, bits: Int = 16): Column =
    Bridge.column(SimHashExpression(Bridge.expression(tokens), bits))
}
