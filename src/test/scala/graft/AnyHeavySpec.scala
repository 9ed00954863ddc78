package graft

import graft.functions.AnyHeavy.anyHeavy
import graft.query.MetricQuery
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boyer–Moore heavy-hitter aggregate (custom Aggregator, E1 path for
  * CH aggregate names beyond Spark built-ins).
  */
class AnyHeavySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("strict majority is always found, across partitions") {
    val data = (Seq.fill(60)(7.5) ++ Seq.tabulate(40)(i => i.toDouble + 100))
    val df = data.toDF("v").repartition(8)
    val got = df.agg(anyHeavy($"v").as("h")).as[Double].collect()(0)
    assert(got == 7.5)
  }

  test("grouped majority per key") {
    val df = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 2.0),
      ("b", 9.0), ("b", 8.0), ("b", 9.0), ("b", 9.0)
    ).toDF("k", "v").repartition(4)
    val got = df.groupBy("k").agg(anyHeavy($"v").as("h"))
      .as[(String, Double)].collect().toMap
    assert(got("a") == 1.0 && got("b") == 9.0)
  }

  test("wired into the rollup dispatch") {
    val df = Seq(
      ("m", 100, 5.0, 1), ("m", 110, 5.0, 2), ("m", 115, 3.0, 3)
    ).toDF("metric", "timestamp", "value", "updated")
    val got = MetricQuery.rollup(df, "anyHeavy", 60)
      .select("value").as[Double].collect()(0)
    assert(got == 5.0)
  }
}
