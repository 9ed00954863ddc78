package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native |A ∩ B| over two SORTED, DISTINCT long-array columns.
  *
  * The composable form — `size(array_intersect(a, b))` — builds an
  * OpenHashSet and materializes the intersection array PER ROW, which
  * dominates candidate-pair verification (n-gram Jaccard: thousands of
  * set elements × every candidate pair). When both sides are already
  * sorted and distinct (`sort_array(collect_set(...))`), the size needs
  * only a single allocation-free merge walk, and |A ∪ B| follows as
  * |A| + |B| − |A ∩ B|. This expression generates that tight loop.
  *
  * PRECONDITION: both arrays ascending-sorted with distinct non-null
  * elements (exactly what `sort_array(collect_set(...))` produces). On
  * unsorted input the count is just wrong — this is a private engine
  * primitive, not a general function. A null ARRAY yields null; a null
  * ELEMENT is a contract violation (the walk returns null only if it
  * happens to visit one — elements past the shorter side are never
  * inspected).
  */
case class SortedIntersectSizeExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size needs array<bigint> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { cnt += 1; i += 1; j += 1 }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x < $y) $i++; else if ($x > $y) $j++; else { $cnt++; $i++; $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $cnt; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectSizeExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_size"
}

object SetExprs {
  /** Codegen'd |A ∩ B| of two sorted-distinct array<bigint> columns. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSizeExpression(Bridge.expression(a), Bridge.expression(b)))
}
