package graft

import java.sql.Timestamp

import graft.streaming.WindowedNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming windowed near-dup: band-colliding similar documents inside
  * the time horizon pair up; distant-in-time copies don't.
  */
class WindowedNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  case class Doc(ts: Timestamp, doc_id: Long, text: String)
  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private val textA = "the quick brown fox jumps over the lazy dog again and again in the morning"
  private val textA2 = "the quick brown fox jumps over the lazy dog again and again in the evening"
  private val textB = "completely unrelated payload about database compaction strategies and parquet row groups"

  test("near-identical docs within the horizon pair up; unrelated and late docs don't") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val out = new WindowedNearDup(horizon = "10 minutes").pairs(source.toDF())
    val q = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      source.addData(
        Doc(t(100), 1L, textA),
        Doc(t(160), 2L, textA2),  // near-dup of 1, within horizon
        Doc(t(200), 3L, textB))   // unrelated
      q.processAllAvailable()
      // a later copy of textA, 1 hour past — outside the 10 min horizon
      // relative to doc 1/2 (and watermark has moved past them)
      source.addData(Doc(t(4000), 4L, textA))
      q.processAllAvailable()
      // advance watermark so in-horizon pairs flush out of the dedup state
      source.addData(Doc(t(8000), 5L, textB + " with an extra tail"))
      q.processAllAvailable()
      val pairs = spark.table("neardup_out")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $pairs")
      assert(!pairs.exists(p => p._2 == 4L), s"out-of-horizon copy paired: $pairs")
    } finally q.stop()
  }

  test("signatures are map-only rows keyed by band") {
    val docs = Seq((t(1), 1L, textA), (t(2), 2L, textA)).toDF("ts", "doc_id", "text")
    val sigs = new WindowedNearDup().signatures(docs).collect()
    assert(sigs.length === 8) // 2 docs x 4 bands
    // identical text → identical signatures → identical band keys
    val byDoc = sigs.groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(3)).toSet)
    assert(byDoc(1L) === byDoc(2L))
  }
}
