package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Levenshtein over the raw UTF-8 bytes of two strings.
  *
  * `functions.levenshtein` walks both strings with codepoint seeks per
  * DP cell, which made q128's 400²-cell verify ~30 ms per pair at
  * sf0.1. This primitive runs the classic two-row DP directly on the
  * byte arrays — and strips the common prefix/suffix FIRST, so
  * identical and near-identical candidates (the near-dup verify's
  * common case) cost O(n) instead of O(n²).
  *
  * PRECONDITION: intended for ASCII content (normalized text — the
  * `[a-z0-9 ]` alphabet), where byte distance IS character distance.
  * On multi-byte UTF-8 this counts byte edits, not codepoint edits —
  * a private engine primitive, not a general function (same contract
  * style as [[SortedIntersectSizeExpression]]).
  */
object EditDistance {
  /** Exact distance (unbounded band). */
  def byteLevenshtein(a: UTF8String, b: UTF8String): Int = byteLevenshtein(a, b, -1)

  /** Banded (Ukkonen) distance: the EXACT distance when it is ≤ `band`,
    * −1 when it exceeds the band — with an early exit the moment every
    * cell of a DP row passes the band (for the near-dup verify's
    * far-apart majority that triggers within ~band rows, making the
    * common case O(band²) instead of O(n·m)). `band < 0` = unbounded.
    */
  def byteLevenshtein(a: UTF8String, b: UTF8String, band: Int): Int = {
    val x = a.getBytes
    val y = b.getBytes
    var lo = 0
    var xHi = x.length
    var yHi = y.length
    // common prefix / suffix never participate in an optimal script
    while (lo < xHi && lo < yHi && x(lo) == y(lo)) lo += 1
    while (xHi > lo && yHi > lo && x(xHi - 1) == y(yHi - 1)) { xHi -= 1; yHi -= 1 }
    val n = xHi - lo
    val m = yHi - lo
    if (n == 0) return if (band >= 0 && m > band) -1 else m
    if (m == 0) return if (band >= 0 && n > band) -1 else n
    if (band >= 0 && math.abs(n - m) > band) return -1
    val inf = if (band >= 0) band + 1 else Int.MaxValue - 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (band < 0 || j <= band) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val jLo = if (band >= 0) math.max(1, i - band) else 1
      val jHi = if (band >= 0) math.min(m, i + band) else m
      // the cell left of the window is outside the band (or column 0)
      cur(jLo - 1) = if (jLo == 1 && (band < 0 || i <= band)) i else inf
      var rowMin = inf
      val xi = x(lo + i - 1)
      j = jLo
      while (j <= jHi) {
        val cost = if (xi == y(lo + j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf // clamp: sentinel arithmetic must not creep
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (band >= 0) {
        if (rowMin > band) return -1 // whole band exceeded: can only grow
        if (jHi < m) cur(jHi + 1) = inf // next row reads this as prev(j-1)
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(m)
    if (band >= 0 && d > band) -1 else d
  }
}

/** `byte_levenshtein(a, b[, band])` → int (see
  * [[EditDistance.byteLevenshtein]]; −1 when the distance exceeds a
  * non-negative `band`).
  */
case class ByteLevenshteinExpression(left: Expression, right: Expression, band: Int = -1)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"byte_levenshtein needs string inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    EditDistance.byteLevenshtein(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], band)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = EditDistance.getClass.getName + ".MODULE$" // EditDistance$ carries MODULE$
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $helper.byteLevenshtein($a, $b, $band);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ByteLevenshteinExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "byte_levenshtein"
}

object EditDistanceExprs {
  /** Codegen'd byte-level Levenshtein of two string columns; `band ≥ 0`
    * returns −1 beyond the band (exact inside it).
    */
  def byteLevenshtein(a: Column, b: Column, band: Int = -1): Column =
    Bridge.column(ByteLevenshteinExpression(Bridge.expression(a), Bridge.expression(b), band))
}
