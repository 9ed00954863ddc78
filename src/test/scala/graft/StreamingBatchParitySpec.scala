package graft

import graft.query.{MetricQuery, QueryParams}
import graft.streaming.{GraphiteServerRegistry, IngestPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming↔batch parity END-TO-END: the SAME ingest corpus replayed
  * through the real GraphiteSource TCP path and through the batch
  * `processBatch` path must serve an IDENTICAL flagship /metricData
  * answer (the q45 shape) — closing SURVEY §3.3's last untested arrow
  * as one pinned invariant: TCP socket → micro-batch parse →
  * date-partitioned append → read-side dedup → rollup → gap fill ≡
  * the batch write of the same points. The two tables' `updated`
  * stamps differ BY DESIGN (receive time vs batch time); the serve
  * must not care, because the corpus is unambiguous per (metric, ts)
  * — exactly the at-least-once + read-side-dedup contract (T4).
  */
class StreamingBatchParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("TCP-streamed table serves the same metricData as the batch-written table") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    // ingest corpus: one line per (metric, second) — duplicate seconds
    // collapse to the max-event_id value up front so the corpus itself
    // is unambiguous and parity cannot hinge on updated-stamp ties
    val lines = SparkEntry.events(spark, dir)
      .filter(col("user_id") < 8 && col("event_type").isin("click", "error"))
      .groupBy(concat(col("event_type"), lit(".u"), col("user_id")).as("metric"),
        col("sec"))
      .agg(max_by(col("value"), col("event_id")).as("value"))
      .select(concat_ws(" ", col("metric"), col("value").cast("string"),
        col("sec").cast("string")).as("line"))
      .as[String].collect().sorted
    assert(lines.nonEmpty)

    val base = java.nio.file.Files.createTempDirectory("graft_parity").toString

    // STREAM path: real TCP socket → startStamped → date-partitioned parquet
    val streamPipe = new IngestPipeline(dataPath = s"$base/sdata", treePath = s"$base/stree")
    val name = s"parity-${System.nanoTime()}"
    val src = spark.readStream.format("graft.streaming.GraphiteSourceProvider")
      .option("port", "0").option("name", name).load()
    val q = streamPipe.startStamped(src, s"$base/ckpt")
    try {
      var port = 0
      val bindDeadline = System.currentTimeMillis() + 10000
      while (port == 0 && System.currentTimeMillis() < bindDeadline) {
        GraphiteServerRegistry.boundPort(name).foreach(p => port = p)
        Thread.sleep(50)
      }
      assert(port > 0, "server did not bind")
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush(); sock.close()
      def dataCount(): Long =
        try spark.read.parquet(s"$base/sdata").count() catch { case _: Exception => 0L }
      val deadline = System.currentTimeMillis() + 60000
      while (dataCount() < lines.length && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      assert(dataCount() == lines.length,
        s"streamed ${dataCount()} of ${lines.length} points")
      assert(q.exception.isEmpty, s"streaming query failed: ${q.exception}")
    } finally q.stop()

    // BATCH path: the same lines through parseBatch → processBatch
    val batchPipe = new IngestPipeline(dataPath = s"$base/bdata", treePath = s"$base/btree")
    batchPipe.processBatch(
      batchPipe.parseBatch(spark.createDataset(lines.toSeq), 1700000000), 0L)

    // the streamed table lands DATE-PARTITIONED on disk (the writer
    // layout the batch table uses — partition pruning works on both)
    val dateParts = new java.io.File(s"$base/sdata").listFiles()
      .filter(_.isDirectory).map(_.getName).count(_.startsWith("date="))
    assert(dateParts > 1, s"expected date= partition dirs, found $dateParts")

    // flagship serve over both tables: q45's params/metrics shape
    val params = QueryParams(1704844800, 1705708800, 21600)
    val metrics = (0 until 8).flatMap(u => Seq(s"click.u$u", s"error.u$u")) :+ "none.u999"
    def served(path: String): Seq[String] =
      MetricQuery.metricData(spark.read.parquet(path), metrics, "avg", params)
        .select(col("metric"), col("start"), col("end"), col("step"),
          array_join(transform(col("points"),
            p => coalesce(round(p, 4).cast("string"), lit("null"))), ",").as("series"))
        .collect().map(_.mkString("|")).sorted.toSeq
    val streamed = served(s"$base/sdata")
    val batch = served(s"$base/bdata")
    assert(streamed == batch, "streamed vs batch metricData diverged")
    assert(streamed.size == metrics.size, "every requested metric serves a row")
  }
}
