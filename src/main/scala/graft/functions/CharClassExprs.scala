package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ASCII character-class counts in one byte walk.
  *
  * The quality features ran two full regex passes per document
  * (`regexp_count` for the punctuation class and for `[A-Za-z]`).
  * Both classes are pure ASCII, and in UTF-8 every non-ASCII CHAR
  * consists solely of bytes ≥ 0x80 — so counting matching BYTES over
  * the raw UTF8String equals counting matching chars, with no
  * decoding and no regex machinery.
  *
  * punct = `[!-/:-@[-`{-~]` (33-47, 58-64, 91-96, 123-126) — ASCII
  * printable minus alphanumerics and space; alpha = `[A-Za-z]`.
  * Output struct (punct, alpha) as longs; null text → null.
  */
object CharClassCounts extends Serializable {

  def counts(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    var punct = 0L
    var alpha = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 33) { // excludes control chars, space, and UTF-8 tail/lead bytes (negative)
        if ((b >= 65 && b <= 90) || (b >= 97 && b <= 122)) alpha += 1
        else if (b <= 47 || (b >= 58 && b <= 64) || (b >= 91 && b <= 96) || (b >= 123 && b <= 126)) punct += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](punct, alpha))
  }
}

case class CharClassCountsExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"char_class_counts needs a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("punct", LongType, nullable = false),
    StructField("alpha", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    CharClassCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = CharClassCounts.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharClassCountsExpression =
    copy(child = newChild)

  override def prettyName: String = "char_class_counts"
}

object CharClassExprs {
  /** One-pass (punct, alpha) ASCII class counts of a string column. */
  def charClassCounts(text: Column): Column =
    Bridge.column(CharClassCountsExpression(Bridge.expression(text)))
}
