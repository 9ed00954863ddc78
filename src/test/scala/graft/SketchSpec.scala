package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tolerance self-checks for the sketch aggregations around
  * q48_sketches. The PRIMARY q48 is now the engine-portable form
  * (seeded-md5 HLL + histogram p50 — oracle-verified bit-exactly);
  * the Spark built-ins (HLL++/GK, engine-specific states) live on as
  * the q48b bench-only twin, and THIS spec is the built-ins' semantic
  * gate: each approximation must land within its documented error
  * envelope of the exact answer computed on the same data.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("approx_count_distinct within HLL++ relative error of exact NDV") {
    // skewed synthetic: 40k rows over ~9.5k distinct keys
    val df = spark.range(40000L)
      .select((col("id") % 9511L * 2654435761L % 9973L).as("k"))
    val exact = df.select(countDistinct(col("k"))).as[Long].head()
    // default rsd = 0.05; allow 3 sigma
    val approx = df.select(approx_count_distinct(col("k"))).as[Long].head()
    val rel = math.abs(approx - exact).toDouble / exact
    assert(rel < 0.15, s"approx NDV $approx vs exact $exact (rel err $rel)")
  }

  test("percentile_approx(accuracy=1000) within rank tolerance of exact median") {
    // long-tailed distribution: value = id^1.5 mod large prime
    val df = spark.range(50000L)
      .select((pow(col("id").cast("double"), 1.5) % 104729.0).as("v"))
    val exact = df.select(percentile(col("v"), lit(0.5))).as[Double].head()
    val approx = df.select(percentile_approx(col("v"), lit(0.5), lit(1000))).as[Double].head()
    // GK sketch guarantees rank error <= 1/accuracy; translate to a
    // value band via the empirical quantiles one rank-tolerance away
    val lo = df.select(percentile(col("v"), lit(0.5 - 2.0 / 1000))).as[Double].head()
    val hi = df.select(percentile(col("v"), lit(0.5 + 2.0 / 1000))).as[Double].head()
    assert(approx >= lo && approx <= hi,
      s"approx p50 $approx outside rank band [$lo, $hi] (exact $exact)")
  }

  test("q48 (portable) and q48b (built-in) both land within tolerance of q94's exact twins") {
    // the closing of the loop: q94_sketch_anchor's exact aggregates are
    // hash-verified against DuckDB; both sketch forms must agree with
    // those same exact values on the same testdata
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val exact = SparkEntry.queries("q94_sketch_anchor")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("exact_users"), r.getAs[Double]("exact_p50")))).toMap
    def check(tag: String, approx: Map[String, (Double, Double)]): Unit = {
      assert(approx.keySet === exact.keySet, tag)
      exact.foreach { case (et, (exUsers, exP50)) =>
        val (apUsers, apP50) = approx(et)
        val rel = math.abs(apUsers - exUsers) / math.max(exUsers, 1L)
        assert(rel < 0.15, s"$tag $et: approx NDV $apUsers vs exact $exUsers (rel $rel)")
        // value band: the per-type value distributions are dense uniforms,
        // so a generous absolute-range check is the stable envelope
        val spread = math.abs(exP50) * 0.1 + 10.0
        assert(math.abs(apP50 - exP50) <= spread,
          s"$tag $et: approx p50 $apP50 vs exact $exP50")
      }
    }
    check("q48", SparkEntry.queries("q48_sketches")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("est_users"), r.getAs[Double]("p50_est")))).toMap)
    check("q48b", SparkEntry.benchOnlyQueries("q48b_sketches_builtin")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("approx_users").toDouble, r.getAs[Double]("approx_p50")))).toMap)
  }

  test("sketch aggregates merge correctly across partitions") {
    // the same data split 1 vs 32 partitions must sketch identically
    // (merge path ≡ single-partition path for deterministic sketches)
    val base = spark.range(20000L).select((col("id") % 4096L).as("k"))
    val one = base.coalesce(1).select(approx_count_distinct(col("k"))).as[Long].head()
    val many = base.repartition(32).select(approx_count_distinct(col("k"))).as[Long].head()
    assert(one === many, "HLL++ must be merge-invariant")
  }
}
