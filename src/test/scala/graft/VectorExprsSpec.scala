package graft

import graft.functions.VectorExprs.dotProduct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native dot-product expression: value parity with the interpreted
  * HOF fold, null/length-mismatch semantics, mixed element types.
  */
class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  test("matches the HOF fold bit-for-bit on float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(dotProduct($"a", $"b").as("native"), hofDot($"a", $"b").as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => assert(n == h, "exact equality, same fold order") }
  }

  test("null array, null element and length mismatch yield null") {
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))), // 11.0
      (None, Some(Seq(Some(1.0f)))),                                          // null array
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f)))),       // null element
      (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(2.0f))))              // length mismatch
    ).toDF("a", "b")
    val out = df.select(dotProduct($"a", $"b")).as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(11.0), None, None, None))
  }

  test("mixed float/double element types widen correctly") {
    val df = Seq((Seq(0.5f, 2.0f), Seq(4.0d, 0.25d))).toDF("a", "b")
    assert(df.select(dotProduct($"a", $"b")).as[Double].collect()(0) == 2.5)
    assert(df.select(dotProduct($"b", $"a")).as[Double].collect()(0) == 2.5)
  }

  test("nearestCell matches the composed when/least arg-min, incl. ties and nulls") {
    import graft.functions.VectorExprs
    val rnd = new scala.util.Random(11)
    val cents = Array.fill(5)(Array.fill(8)(rnd.nextDouble() * 2 - 1))
    // random vectors + exact copies of centroids 1 and 3 (distance-0
    // rows) + a duplicated centroid pair to force an exact tie
    val tieCents = cents.updated(4, cents(2).clone)
    val vecs: Seq[Option[Seq[Option[Float]]]] =
      Seq.fill(300)(Some(Array.fill(8)(Some(rnd.nextFloat() * 2 - 1)).toSeq)) ++
        Seq(Some(cents(1).map(d => Some(d.toFloat)).toSeq),
          Some(cents(3).map(d => Some(d.toFloat)).toSeq),
          None,                                     // null vector
          Some(Seq(Some(1f), None, Some(1f), Some(1f), Some(1f), Some(1f), Some(1f), Some(1f))), // null element
          Some(Seq(Some(1f), Some(2f))))            // length mismatch
    val df = vecs.toDF("v")
    def composed(cs: Array[Array[Double]]) = {
      val dists = cs.toSeq.map(c => VectorExprs.l2Squared($"v", array(c.map(lit).toSeq: _*)))
      val minD = least(dists: _*)
      cs.indices.map(j => when(dists(j) === minD, lit(j))).reduce(coalesce(_, _))
    }
    for (cs <- Seq(cents, tieCents)) {
      val out = df.select(VectorExprs.nearestCell($"v", cs).as("native"),
        composed(cs).as("ref")).as[(Option[Int], Option[Int])].collect()
      out.foreach { case (n, r) => assert(n === r) }
    }
  }

  test("nearestCell on an all-NaN vector yields null (deliberate deviation from the chain's cell 0)") {
    import graft.functions.VectorExprs
    val cents = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    // NaN distances: `sum < best` never fires, the when/least chain's
    // coalesce falls through to null — a NaN embedding must NOT route
    // to a bogus cell
    val df = Seq(
      Seq(Float.NaN, Float.NaN),
      Seq(Float.NaN, 1.0f),
      Seq(0.1f, 0.1f)).toDF("v")
    val out = df.select(VectorExprs.nearestCell($"v", cents)).as[Option[Int]].collect().toSeq
    assert(out == Seq(None, None, Some(0)))
  }
}
