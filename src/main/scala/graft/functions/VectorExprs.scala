package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric-array columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * runs INTERPRETED: Spark's higher-order functions evaluate their
  * lambda per element outside whole-stage codegen, which dominates the
  * ANN hot paths (millions of candidate pairs × vector dims). This
  * expression generates a tight primitive loop instead.
  *
  * Semantics are IDENTICAL to the HOF fold (oracle-parity matters):
  * each element widens to double before the multiply, products
  * accumulate left-to-right (same floating-point fold order), a null
  * element or length mismatch yields null — exactly what
  * `zip_with`'s null-padding + `+`'s null propagation produce.
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val aFloat = elemType(left.dataType).contains(FloatType)
    val bFloat = elemType(right.dataType).contains(FloatType)
    var sum = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left.dataType).contains(FloatType)) "getFloat" else "getDouble"
    val bGet = if (elemType(right.dataType).contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += (double) $a.$aGet($i) * (double) $b.$bGet($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Native squared-L2 distance — same contract and fold order as
  * [[DotProductExpression]] with `(x−y)²` terms: the identical
  * left-to-right accumulation the oracle's
  * `list_sum(list_transform(list_zip(a,b), p -> (p[1]-p[2])^2))`
  * performs, so distances are bit-deterministic across engines.
  */
case class L2SquaredExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"l2_squared needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val aFloat = elemType(left.dataType).contains(FloatType)
    val bFloat = elemType(right.dataType).contains(FloatType)
    var sum = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left.dataType).contains(FloatType)) "getFloat" else "getDouble"
    val bGet = if (elemType(right.dataType).contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.$aGet($i) - (double) $b.$bGet($i);
         |    $sum += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2SquaredExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_squared"
}

/** Native arg-min-squared-L2 cell assignment against a fixed centroid
  * table (k-means assignment, IVF routing). One pass: every distance is
  * evaluated exactly once per row.
  *
  * The composable form — `coalesce(when(dist_j === least(dists), j)…)`
  * — re-substitutes `least(dists)` (all k folds) into every WHEN
  * branch, ~k(k+1) fold evaluations per row; worse, the nullable
  * result makes InferFiltersFromJoin put an `isnotnull(<whole chain>)`
  * Filter under any equi-join on the cell, doubling that again
  * (measured 30× on the semdedup pair join, NOTES_r3 trap #2's filter
  * variant).
  *
  * Semantics match the chain exactly for non-NaN inputs: distances fold
  * left-to-right per centroid (bit-identical to [[L2SquaredExpression]]);
  * the lowest cell index wins ties (strict `<` update); a null input
  * vector, a null element, an empty centroid table, or a length mismatch
  * yield null. A vector whose distances are all NaN (NaN embedding) ALSO
  * yields null — a deliberate deviation from both the when/least chain
  * and an `ORDER BY dist, cell` oracle (Spark's `NaN === NaN` is true and
  * `least` of all-NaN returns NaN, so the chain would pick cell 0, as
  * would DuckDB's NaN-last sort). Routing garbage to null instead of
  * silently polluting cell 0 is the useful behavior; the kmeans/semdedup
  * oracle queries rely on the testdata embeddings being NaN-free, so the
  * deviation is unobservable there by construction.
  */
case class NearestCellExpression(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(child.dataType).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_cell needs an array<float|double> input, got ${child.dataType.catalogString}")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (cents.isEmpty || n != cents(0).length) return null
    val aFloat = elemType(child.dataType).contains(FloatType)
    var best = Double.PositiveInfinity
    var cell = -1
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var sum = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val d = x - c(i)
        sum += d * d
        i += 1
      }
      if (sum < best) { best = sum; cell = j }
      j += 1
    }
    if (cell == -1) null else cell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val aGet = if (elemType(child.dataType).contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val cell = ctx.freshName("cell")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($centsRef.length == 0 || $n != $centsRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $cell = -1;
         |  for (int $j = 0; $j < $centsRef.length && !${ev.isNull}; $j++) {
         |    double $sum = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      double $d = (double) $a.$aGet($i) - $centsRef[$j][$i];
         |      $sum += $d * $d;
         |    }
         |    if (!${ev.isNull} && $sum < $best) { $best = $sum; $cell = $j; }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($cell == -1) { ${ev.isNull} = true; } else { ${ev.value} = $cell; }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpression =
    copy(child = newChild)

  override def prettyName: String = "nearest_cell"
}

/** Native Σ x² over an `array<long>` column — the per-vector banked
  * squared norm (`sum(b6*b6)` of the exploded form, r14). Wrapping
  * long arithmetic, bit-identical to `Multiply`+`Sum` over longs in
  * any row order; a null element yields null (the `sum` of a null
  * product would SKIP the element — but banked coordinate arrays are
  * built with `containsNull = false`, so the branch is unreachable
  * there and null-in/null-out is the conservative contract).
  */
case class SumSqLongExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sum_sq_long needs an array<bigint> input, got ${dt.catalogString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var sum = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getLong(i)
      sum += x * x
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $x = $a.getLong($i);
         |  $sum += $x * $x;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumSqLongExpression =
    copy(child = newChild)

  override def prettyName: String = "sum_sq_long"
}

object VectorExprs {
  /** Codegen'd dot product of two array<float|double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProductExpression(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd Σ x² of an array<long> column (wrapping, order-free). */
  def sumSqLong(a: Column): Column =
    Bridge.column(SumSqLongExpression(Bridge.expression(a)))

  /** Codegen'd squared-L2 distance of two array<float|double> columns. */
  def l2Squared(a: Column, b: Column): Column =
    Bridge.column(L2SquaredExpression(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd single-pass arg-min-L2 cell id against literal centroids. */
  def nearestCell(vec: Column, cents: Array[Array[Double]]): Column =
    Bridge.column(NearestCellExpression(Bridge.expression(vec), cents))
}
