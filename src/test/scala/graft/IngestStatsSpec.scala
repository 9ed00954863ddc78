package graft

import graft.streaming.{IngestPipeline, IngestStatsListener, WindowedStats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IngestStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("listener appends self-metric rows per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    val listener = new IngestStatsListener(spark, s"$dir/stats")
    spark.streams.addListener(listener)
    try {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[String]
      val pipe = new IngestPipeline(dataPath = s"$dir/data", treePath = s"$dir/tree")
      val q = pipe.start(source.toDS(), s"$dir/ckpt")
      try {
        source.addData("one_min.app.a.x 1 1700000000", "one_min.app.a.y 2 1700000001")
        q.processAllAvailable()
      } finally q.stop()
      // listener fires asynchronously; poll for the stats table
      val deadline = System.currentTimeMillis() + 15000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        ok = try {
          val stats = spark.read.parquet(s"$dir/stats")
          stats.filter($"metric" === "one_min.graft.ingest.input_rows" && $"value" >= 2.0).count() > 0
        } catch { case _: Exception => false }
        if (!ok) Thread.sleep(200)
      }
      assert(ok, "expected an input_rows stats point >= 2")
    } finally spark.streams.removeListener(listener)
  }

  test("watermarked sliding-window aggregation (streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Double, java.sql.Timestamp)]
    val points = source.toDS().toDF("metric", "value", "event_time")
    val agg = WindowedStats.slidingAgg(points, "10 minutes", "5 minutes", "15 minutes")
    val name = s"winagg_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      source.addData(
        ("m.a", 10.0, ts("2024-01-01 00:01:00")),
        ("m.a", 20.0, ts("2024-01-01 00:03:00")),
        ("m.b", 5.0, ts("2024-01-01 00:02:00"))
      )
      q.processAllAvailable()
      // advance watermark far past the first windows so they emit
      source.addData(("m.a", 1.0, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      source.addData(("m.a", 1.0, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      val out = spark.table(name)
        .filter($"metric" === "m.a" && $"window_start" === ts("2024-01-01 00:00:00"))
        .select("avg_value", "n").as[(Double, Long)].collect()
      assert(out.length == 1 && out(0) == ((15.0, 2L)), s"got ${out.toSeq}")
    } finally q.stop()
  }
}
