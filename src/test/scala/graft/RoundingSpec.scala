package graft

import graft.ops.Rounding
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** Binary-consistent rounding: DuckDB-matching boundary behavior,
  * passthrough of huge/non-finite values, sign handling.
  */
class RoundingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def r(x: Double, d: Int): Double =
    Seq(x).toDF("x").select(Rounding.round($"x", d)).as[Double].collect()(0)

  test("decimal-boundary values round like the binary double (DuckDB), not the decimal string") {
    // 51.51125 is stored as 51.51124999...: binary rounding goes DOWN;
    // Spark's functions.round would give 51.5113 via the decimal string
    assert(r(51.51125, 4) == 51.5112)
    assert(r(0.64465, 4) == 0.6446)
    assert(r(-51.51125, 4) == -51.5112)
    assert(r(2.5, 0) == 3.0)
    assert(r(-2.5, 0) == -3.0, "half away from zero on negatives")
    assert(r(3.14159, 4) == 3.1416)
  }

  test("huge and non-finite values pass through unchanged") {
    assert(r(1e19, 0) == 1e19, "beyond Long range: identity, not saturation")
    assert(r(4.5e15, 2) == 4.5e15)
    assert(r(Double.PositiveInfinity, 4).isPosInfinity)
    assert(r(Double.NegativeInfinity, 4).isNegInfinity)
    assert(r(Double.NaN, 4).isNaN)
    val nullOut = Seq(Option.empty[Double]).toDF("x")
      .select(Rounding.round($"x", 4)).as[Option[Double]].collect()(0)
    assert(nullOut.isEmpty)
  }
}
