package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** One-pass repetition statistics over a token array.
  *
  * Replaces two full-corpus explodes (unigrams + generated bigram
  * positions) feeding three hash aggregations with a single walk per
  * document: tokens are dictionary-encoded on the fly (HashMap ->
  * dense int id), unigram counts accumulate per id, and distinct
  * bigrams are the distinct (id, id) adjacent pairs packed into one
  * long. Counts are EXACT — the dictionary makes pair identity
  * equality-based, not hash-based — so the DuckDB oracle (unnest +
  * GROUP BY) stays valid unchanged.
  *
  * Output struct (all counts, ratio arithmetic stays in the SQL layer
  * where the shared rounding lives): n_tokens, ndis (distinct tokens),
  * top (most-common-token count), btot (bigram count = max(n-1, 0)),
  * bdis (distinct bigrams). A null token array yields a null struct.
  */
object TokenStats extends Serializable {

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val dict = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](
      math.max(8, n / 2))
    var countArr = new Array[Int](math.max(8, n / 2))
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
              else arr.getUTF8String(i)
      var id = dict.get(t)
      if (id == null) {
        id = Integer.valueOf(dict.size)
        dict.put(t, id)
        if (id >= countArr.length)
          countArr = java.util.Arrays.copyOf(countArr, countArr.length * 2)
      }
      countArr(id) += 1
      ids(i) = id
      i += 1
    }
    val ndis = dict.size
    var top = 0
    i = 0
    while (i < ndis) { if (countArr(i) > top) top = countArr(i); i += 1 }
    var bdis = 0
    if (n >= 2) {
      val pairs = new java.util.HashSet[java.lang.Long](math.max(8, n))
      i = 0
      while (i < n - 1) {
        pairs.add((ids(i).toLong << 32) | (ids(i + 1).toLong & 0xffffffffL))
        i += 1
      }
      bdis = pairs.size
    }
    new GenericInternalRow(Array[Any](
      n.toLong, ndis.toLong, top.toLong, math.max(n - 1, 0).toLong, bdis.toLong))
  }
}

case class TokenStatsExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_stats needs an array<string> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("ndis", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("btot", LongType, nullable = false),
    StructField("bdis", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TokenStats.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpression =
    copy(child = newChild)

  override def prettyName: String = "token_stats"
}

object TokenStatsExprs {
  /** One-pass unigram/bigram repetition counts of a token-array column. */
  def tokenStats(tokens: Column): Column =
    Bridge.column(TokenStatsExpression(Bridge.expression(tokens)))
}
