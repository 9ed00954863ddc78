package graft

import graft.ops.SeriesOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the second wave of the graphite function layer: ewma,
  * Holt linear smoothing, hitcount, moving-stats anomaly flags, and the
  * series-filter family (highestMax / averageAbove / current shapes).
  */
class SeriesWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def series = Seq(
    ("m1", 0L, 10.0), ("m1", 60L, 13.0), ("m1", 120L, 11.0), ("m1", 180L, 20.0),
    ("m2", 0L, 5.0), ("m2", 60L, 5.0)
  ).toDF("metric", "ts", "v")

  test("ewma folds sequentially per series") {
    val out = SeriesOps.ewma(series, alpha = 0.5)
      .orderBy("metric", "ts").as[(String, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("m1", 0L, 10.0, 10.0), ("m1", 60L, 13.0, 11.5),
      ("m1", 120L, 11.0, 11.25), ("m1", 180L, 20.0, 15.625),
      ("m2", 0L, 5.0, 5.0), ("m2", 60L, 5.0, 5.0)))
  }

  test("ewma: null points emit null and carry state forward") {
    val gappy = Seq(("m3", 0L, Some(10.0)), ("m3", 60L, None), ("m3", 120L, Some(16.0)))
      .toDF("metric", "ts", "v")
    val out = SeriesOps.ewma(gappy, alpha = 0.5)
      .orderBy("ts").select("ewma").as[Option[Double]].collect().toSeq
    assert(out === Seq(Some(10.0), None, Some(13.0)))
  }

  test("holtLinear tracks level and trend") {
    val out = SeriesOps.holtLinear(series.filter(col("metric") === "m1").limit(3),
        alpha = 0.5, betaP = 0.5)
      .orderBy("ts").select("level", "trend").as[(Double, Double)].collect().toSeq
    assert(out === Seq((10.0, 0.0), (11.5, 0.75), (11.625, 0.4375)))
  }

  test("holtWinters: additive seasonal fold, hand-computed goldens") {
    // period 2, α=β=γ=0.5 over 10,12,14,16: phases alternate 0/1
    val in = Seq(("a", 0L, 10.0), ("a", 60L, 12.0), ("a", 120L, 14.0), ("a", 180L, 16.0))
      .toDF("metric", "ts", "v")
    val out = SeriesOps.holtWinters(in, 0.5, 0.5, 0.5, period = 2)
      .orderBy("ts")
      .select("level", "trend", "seasonal", "forecast")
      .as[(Double, Double, Double, Option[Double])].collect().toSeq
    assert(out === Seq(
      (10.0, 0.0, 0.0, None),                    // seed: s=v, b=0, c untouched
      (11.0, 0.5, 0.5, Some(10.0)),              // forecast = s+b+c[1] pre-update
      (12.75, 1.125, 0.625, Some(11.5)),
      (14.6875, 1.53125, 0.90625, Some(14.375))))
  }

  test("holtWinters: nulls carry state, emit null, and still advance the phase") {
    val in = Seq(("a", 0L, Some(10.0)), ("a", 60L, Some(12.0)),
      ("a", 120L, Option.empty[Double]), ("a", 180L, Some(16.0)))
      .toDF("metric", "ts", "v")
    val out = SeriesOps.holtWinters(in, 0.5, 0.5, 0.5, period = 2)
      .orderBy("ts")
      .select("level", "trend", "seasonal", "forecast")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(out(2) === ((None, None, None, None)), "null point emits all-null")
    // t=3 lands back on phase 1 (slot grid kept aligned through the gap)
    assert(out(3) === ((Some(13.5), Some(1.5), Some(1.5), Some(12.0))))
  }

  test("hitcount converts a rate series to per-bucket totals") {
    val out = SeriesOps.hitcount(series, bucketSeconds = 120, stepSeconds = 60)
      .orderBy("metric", "ts").as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("m1", 0L, 1380.0), ("m1", 120L, 1860.0), ("m2", 0L, 600.0)))
  }

  test("anomalies: z-score null under 2 points or zero sd, flag over threshold") {
    val flat = Seq(("a", 0L, 10.0), ("a", 60L, 10.0), ("a", 120L, 10.0), ("a", 180L, 20.0))
      .toDF("metric", "ts", "v")
    val out = SeriesOps.anomalies(flat, points = 3, zThreshold = 1.0)
      .orderBy("ts").select("z", "is_anomaly")
      .as[(Option[Double], Boolean)].collect().toSeq
    assert(out(0) === ((None, false)))       // single point: no sd
    assert(out(1) === ((None, false)))       // sd = 0
    assert(out(2) === ((None, false)))       // sd = 0
    assert(out(3)._1.exists(z => math.abs(z - 1.1547) < 1e-4))
    assert(out(3)._2)
  }

  test("seriesStat current = last reported point") {
    val out = SeriesOps.seriesStat(series, "current")
      .orderBy("metric").as[(String, Double)].collect().toSeq
    assert(out === Seq(("m1", 20.0), ("m2", 5.0)))
    intercept[IllegalArgumentException](SeriesOps.seriesStat(series, "median"))
  }

  test("filterSeries keeps whole series past the threshold") {
    val out = SeriesOps.filterSeries(series, "avg", minStat = 10.0)
    assert(out.select("metric").distinct().as[String].collect().toSeq === Seq("m1"))
    assert(out.count() === 4)
  }

  test("topKSeries keeps the k highest-ranked series") {
    val out = SeriesOps.topKSeries(series, "max", k = 1)
    assert(out.select("metric").distinct().as[String].collect().toSeq === Seq("m1"))
    assert(out.count() === 4)
  }

  test("groupByNodes collapses series sharing the selected name levels") {
    val named = Seq(
      ("app.hostA.req", 0L, 1.0), ("app.hostB.req", 0L, 2.0),
      ("app.hostA.req", 60L, 5.0), ("db.hostA.req", 0L, 7.0))
      .toDF("metric", "ts", "v")
    val out = SeriesOps.groupByNodes(named, Seq(0, 2), "sum")
      .orderBy("metric", "ts").as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("app.req", 0L, 3.0), ("app.req", 60L, 5.0), ("db.req", 0L, 7.0)))
    intercept[IllegalArgumentException](SeriesOps.groupByNodes(named, Seq.empty))
  }

  test("asPercent normalizes by the per-timestamp total") {
    val out = SeriesOps.asPercent(series)
      .orderBy("ts", "metric").select("metric", "ts", "pct")
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("m1", 0L, 10.0 / 15.0 * 100), ("m2", 0L, 5.0 / 15.0 * 100),
      ("m1", 60L, 13.0 / 18.0 * 100), ("m2", 60L, 5.0 / 18.0 * 100),
      ("m1", 120L, 100.0), ("m1", 180L, 100.0)))
  }
}
