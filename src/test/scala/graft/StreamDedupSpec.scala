package graft

import java.sql.Timestamp

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact-dedup: first arrival per content fingerprint
  * survives, duplicates across micro-batches are dropped while inside
  * the watermark horizon.
  */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  case class Doc(ts: Timestamp, doc_id: Long, text: String)
  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("cross-batch duplicates collapse to the first arrival") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val out = StreamDedup.dedupStream(source.toDF(), "ts", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      source.addData(
        Doc(t(100), 1L, "same content here"),
        Doc(t(110), 2L, "Same   content, here!"), // same fingerprint (normalization)
        Doc(t(120), 3L, "different content"))
      q.processAllAvailable()
      // batch 2: another copy arrives within the watermark → dropped
      source.addData(Doc(t(200), 4L, "same content here"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 3L))
    } finally q.stop()
  }

  test("key-based variant dedups on the explicit key") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val out = StreamDedup.dedupStreamByKey(source.toDF(), "ts", Seq("doc_id"))
    val q = out.writeStream.format("memory").queryName("dedup_key_out")
      .outputMode(OutputMode.Append).start()
    try {
      source.addData(Doc(t(100), 1L, "a"), Doc(t(110), 1L, "b"), Doc(t(120), 2L, "c"))
      q.processAllAvailable()
      val rows = spark.table("dedup_key_out").select("doc_id").as[Long].collect().toSeq
      assert(rows.sorted === Seq(1L, 2L))
    } finally q.stop()
  }
}
