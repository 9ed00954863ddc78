package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Latin-script language-marker hit counting.
  *
  * The composable form ran `size(array_intersect(distinct_tokens,
  * markers_l))` once per language — seven hash-set builds and
  * intersection arrays PER ROW. Here the marker vocabulary is inverted
  * ONCE into a static token → language-indices map (marker words
  * overlap across languages: "de", "la", "en"…), so counting is a
  * single walk with one hash lookup per token.
  *
  * PRECONDITION: input must be the DISTINCT token array (the counts
  * are distinct-marker hits, `array_distinct(tokens(text))`). Output:
  * array<int> of hit counts indexed by [[LangHits.latinLangs]]
  * (sorted). Null input → null.
  */
object LangHits extends Serializable {

  /** Latin-script languages in sorted order — the output index space. */
  val latinLangs: Seq[String] =
    graft.ops.TextOps.langMarkers.keys.filterNot(graft.ops.TextOps.nonLatin).toSeq.sorted

  private val markerIndex: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    latinLangs.zipWithIndex.foreach { case (l, i) =>
      graft.ops.TextOps.langMarkers(l).foreach { w =>
        val u = UTF8String.fromString(w)
        val cur = m.get(u)
        m.put(u, if (cur == null) Array(i) else cur :+ i)
      }
    }
    m
  }

  def hits(arr: ArrayData): Array[Int] = {
    val out = new Array[Int](latinLangs.size)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val ls = markerIndex.get(arr.getUTF8String(i))
        if (ls != null) {
          var j = 0
          while (j < ls.length) { out(ls(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    out
  }
}

case class LangHitsExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lang_hits needs an array<string> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(LangHits.hits(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = LangHits.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($helper.hits($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): LangHitsExpression =
    copy(child = newChild)

  override def prettyName: String = "lang_hits"
}

/** One-pass containment-marker hit counting for the non-Latin-script
  * languages (whose tokens the whitespace regex cannot segment).
  *
  * The composable form ran `instr(lower(text), m) > 0` once per marker
  * word — 30 probes, each re-lowering the whole text. Here the text is
  * lowercased ONCE and each marker checked with a single `contains`
  * walk. Output: array<int> of distinct-marker hit counts indexed by
  * [[NonLatinHits.langs]] (sorted). Null input → null. Counts are
  * value-identical to the composable probes.
  */
object NonLatinHits extends Serializable {

  /** Non-Latin-script languages in sorted order — the output index space. */
  val langs: Seq[String] = graft.ops.TextOps.nonLatin.toSeq.sorted

  private val markers: Array[Array[UTF8String]] =
    langs.map(l => graft.ops.TextOps.langMarkers(l)
      .map(UTF8String.fromString).toArray).toArray

  def hits(text: UTF8String): Array[Int] = {
    // lower() like the token path: upper-case Cyrillic must still hit
    // the lowercase markers (CJK has no case, lower() is a no-op there)
    val lowered = text.toLowerCase
    val out = new Array[Int](markers.length)
    var i = 0
    while (i < markers.length) {
      val ms = markers(i)
      var j = 0
      var c = 0
      while (j < ms.length) {
        if (lowered.contains(ms(j))) c += 1
        j += 1
      }
      out(i) = c
      i += 1
    }
    out
  }
}

case class NonLatinHitsExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nonlatin_hits needs a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(NonLatinHits.hits(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NonLatinHits.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($helper.hits($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): NonLatinHitsExpression =
    copy(child = newChild)

  override def prettyName: String = "nonlatin_hits"
}

object LangHitsExprs {
  /** Per-Latin-language distinct-marker hit counts of a DISTINCT
    * token-array column, indexed by [[LangHits.latinLangs]].
    */
  def langHits(distinctTokens: Column): Column =
    Bridge.column(LangHitsExpression(Bridge.expression(distinctTokens)))

  /** Per-non-Latin-language containment-marker hit counts of a raw
    * text column, indexed by [[NonLatinHits.langs]].
    */
  def nonLatinHits(text: Column): Column =
    Bridge.column(NonLatinHitsExpression(Bridge.expression(text)))
}
