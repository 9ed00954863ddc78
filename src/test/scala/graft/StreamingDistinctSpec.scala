package graft

import graft.streaming.StreamingDistinct
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HLL distinct: constant 2^b-register state per key,
  * replay-idempotent updates, and estimates bit-identical to the batch
  * sketch over the same items.
  */
object StreamingDistinctSpec {
  case class Item(k: String, item: Long)
}

class StreamingDistinctSpec extends AnyFunSuite {
  import StreamingDistinctSpec.Item
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streaming estimate equals the batch estimate; replays are idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Item]
    val est = StreamingDistinct.distinctEstimates(source.toDF(), "k", "item")
    val q = StreamingDistinct.startMemorySink(est, "sd_out")
    try {
      val batch1 = (1 to 400).map(i => Item("a", i.toLong)) ++
        (1 to 50).map(i => Item("b", i.toLong))
      source.addData(batch1: _*)
      q.processAllAvailable()
      // batch 2: half replays (must not move the estimate), half new
      val batch2 = (200 to 600).map(i => Item("a", i.toLong))
      source.addData(batch2: _*)
      q.processAllAvailable()
      val latest = spark.table("sd_out")
        .groupBy("key").agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.col("estimate"),
          org.apache.spark.sql.functions.col("n_items_seen")).as("estimate"))
        .as[(String, Double)].collect().toMap

      // parity: the batch twin over the union of all items
      val allRows = (batch1 ++ batch2).toDF("k", "item")
      val batchEst = StreamingDistinct.distinctEstimatesBatch(allRows, "k", "item")
        .as[(String, Double)].collect().toMap

      assert(latest.keySet == Set("a", "b"))
      assert(latest("a") == batchEst("a"),
        s"stream ${latest("a")} != batch ${batchEst("a")}")
      assert(latest("b") == batchEst("b"))
      // sanity: estimates track the true distinct counts (600 and 50)
      assert(math.abs(latest("a") - 600) / 600.0 < 0.2)
      assert(math.abs(latest("b") - 50) / 50.0 < 0.1)
    } finally q.stop()
  }

  test("pure replay batch leaves the estimate unchanged (at-least-once safe)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Item]
    val est = StreamingDistinct.distinctEstimates(source.toDF(), "k", "item")
    val q = StreamingDistinct.startMemorySink(est, "sd_replay")
    try {
      source.addData((1 to 100).map(i => Item("x", i.toLong)): _*)
      q.processAllAvailable()
      val e1 = spark.table("sd_replay").as[(String, Long, Double)]
        .collect().maxBy(_._2)._3
      source.addData((1 to 100).map(i => Item("x", i.toLong)): _*) // exact replay
      q.processAllAvailable()
      val e2 = spark.table("sd_replay").as[(String, Long, Double)]
        .collect().maxBy(_._2)._3
      assert(e1 == e2, s"replay moved the estimate: $e1 -> $e2")
    } finally q.stop()
  }
}
