package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text normalization / tokenization over ALREADY-LOWERCASED
  * strings — the byte-walk replacements for the two hottest regex
  * chains in the corpus path (the CharClassCounts argument, applied to
  * the canonical-form and token functions):
  *
  *   normalized(t) = trim(regexp_replace(regexp_replace(lower(t),
  *                     "[^a-z0-9\\s]", " "), "\\s+", " "))
  *   tokens(t)     = filter(split(lower(t), "[^a-z0-9_']+"), x -> x != "")
  *
  * Equivalence argument (chars → bytes): regex pass 1 maps every char
  * outside the keep class to ONE space and pass 2 collapses any
  * whitespace run to one space, so the composite maps every maximal
  * run of non-kept chars to exactly one separator and trims the ends —
  * i.e. the result is the kept-class runs joined by single spaces.
  * In UTF-8 every byte of a multi-byte char is ≥ 0x80, hence outside
  * both ASCII keep classes, so maximal kept-char runs equal maximal
  * kept-BYTE runs and the walk needs no decoding. `split` semantics
  * (leading/trailing empty fields) are absorbed by the empty filter.
  * Lower-casing is NOT reimplemented: callers compose these after the
  * built-in `lower`, keeping Spark's collation-aware lowercase
  * byte-identical with the regex form.
  */
object NormText extends Serializable {

  @inline private def keepNorm(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  @inline private def keepTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_' || b == '\''

  /** Kept-byte runs joined by single spaces; no leading/trailing space. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var w = 0
    var pendingSep = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (keepNorm(b)) {
        if (pendingSep && w > 0) { out(w) = ' '; w += 1 }
        pendingSep = false
        out(w) = b; w += 1
      } else pendingSep = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, w)
  }

  /** Maximal kept-byte runs, in order (the non-empty split fields). */
  def tokenize(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val toks = new scala.collection.mutable.ArrayBuffer[Any](8)
    var start = -1
    var i = 0
    while (i < n) {
      if (keepTok(bytes(i))) { if (start < 0) start = i }
      else if (start >= 0) {
        toks += UTF8String.fromBytes(bytes, start, i - start)
        start = -1
      }
      i += 1
    }
    if (start >= 0) toks += UTF8String.fromBytes(bytes, start, n - start)
    new GenericArrayData(toks.toArray)
  }
}

/** `norm_ascii(lowered)` — the normalized-text byte walk (see [[NormText]]). */
case class NormAsciiExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"norm_ascii needs a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NormText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NormText.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormAsciiExpression =
    copy(child = newChild)

  override def prettyName: String = "norm_ascii"
}

/** `tokens_ascii(lowered)` — the token byte walk (see [[NormText]]). */
case class TokensAsciiExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"tokens_ascii needs a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NormText.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NormText.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.tokenize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokensAsciiExpression =
    copy(child = newChild)

  override def prettyName: String = "tokens_ascii"
}

object NormTextExprs {
  /** Normalized text (lower → single byte-walk), ≡ the regex chain. */
  def normalized(text: Column): Column =
    Bridge.column(NormAsciiExpression(
      Bridge.expression(org.apache.spark.sql.functions.lower(text))))

  /** Word tokens (lower → single byte-walk), ≡ split+filter. */
  def tokens(text: Column): Column =
    Bridge.column(TokensAsciiExpression(
      Bridge.expression(org.apache.spark.sql.functions.lower(text))))
}
