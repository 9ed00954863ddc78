package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix(s, hexDigits)` ≡
  * `conv(substring(md5(s), 1, hexDigits), 16, 10) cast long` — the
  * engine-portable seeded-hash idiom (`SampleOps.seededHash` /
  * `hashBucket` / the count-min row hash), with the hex round trip
  * removed: the old chain encoded the 16-byte digest to a 32-char hex
  * string, substringed it, then PARSED it back base-16; this
  * expression reads the same `4·hexDigits` leading bits straight off
  * the digest bytes. The md5 itself (the semantic content) is
  * unchanged — same UTF-8 input bytes, same prefix, so the value is
  * bit-identical and every DuckDB oracle replay
  * (`CAST('0x' || substr(md5(..), 1, 15) AS BIGINT)`) still matches.
  *
  * hexDigits ≤ 15 keeps the value inside a signed long (60 bits),
  * exactly the old `conv(...) cast("long")` range contract.
  */
object Md5Prefix extends Serializable {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def prefix(s: UTF8String, hexDigits: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    // leading hexDigits nibbles of the hex encoding == leading
    // 4*hexDigits bits of the digest, most-significant-nibble first
    var v = 0L
    var i = 0
    while (i < hexDigits) {
      val b = digest(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

case class Md5PrefixExpression(child: Expression, hexDigits: Int) extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15,
    s"md5_prefix needs 1 <= hexDigits <= 15 (long range), got $hexDigits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix needs a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.prefix(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Md5Prefix.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.prefix($c, $hexDigits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixExpression =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix"
}

object Md5PrefixExprs {
  /** Long value of the first `hexDigits` hex chars of md5(s). */
  def md5Prefix(s: Column, hexDigits: Int): Column =
    Bridge.column(Md5PrefixExpression(Bridge.expression(s), hexDigits))
}
