package graft

import graft.functions.CompressExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compression-ratio signal: range, repetition monotonicity, null/empty
  * handling, and codegen/interpreted agreement.
  */
class CompressExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("repetitive text compresses far below varied text") {
    val varied = (1 to 200).map(i => s"w${i}x${i * 7 % 91}").mkString(" ")
    val repeated = "the same phrase again " * 60
    val df = Seq(("v", varied), ("r", repeated), ("e", ""), ("s", "ab"))
      .toDF("k", "text")
      .select(col("k"), CompressExprs.compressionRatio(col("text")).as("cr"))
    val m = df.as[(String, Double)].collect().toMap
    assert(m("r") < 0.2, s"repeated text ratio ${m("r")} not << 1")
    assert(m("v") > m("r") * 2, "varied text must compress worse than repeated")
    assert(m("v") > 0.3 && m("v") <= 1.5)
    assert(m("e") === 1.0)              // empty → defined as 1.0
    assert(m("s") > 1.0)                // tiny input: deflate overhead dominates
  }

  test("null text yields null; eval and codegen paths agree") {
    val df = Seq(Option("hello hello hello hello"), None).toDF("text")
      .select(CompressExprs.compressionRatio(col("text")).as("cr"))
    val got = df.as[Option[Double]].collect()
    assert(got(1).isEmpty)
    // force an interpreted evaluation via a literal-free filter compare
    val v = got(0).get
    import graft.functions.CompressionRatioExpression
    import org.apache.spark.sql.graftbridge.Bridge
    val interp = CompressionRatioExpression(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello hello hello hello")))
      .eval(null).asInstanceOf[Double]
    assert(math.abs(v - interp) < 1e-12)
  }
}
