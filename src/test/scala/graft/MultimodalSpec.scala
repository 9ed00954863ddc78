package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaItem
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: batched stub decoder ≡ expression path; frame
  * sampling and resize plans behave.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def media = Seq(
    MediaItem(0L, "image", "x".repeat(700).getBytes("UTF-8")),
    MediaItem(1L, "audio", "abcdef".getBytes("UTF-8")),
    MediaItem(2L, "video", "y".repeat(100).getBytes("UTF-8"))
  )

  test("batched decoder and expression path agree") {
    val ds = spark.createDataset(media).repartition(2)
    val decoded = MultimodalOps.decode(ds).toDF()
    val viaExpr = MultimodalOps.metadataExpr(ds.toDF())
    val a = decoded.orderBy("media_id").collect().map(_.toSeq)
    val b = viaExpr.orderBy("media_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
    // partition count preserved (one decoder call per partition)
    assert(MultimodalOps.decode(ds).rdd.getNumPartitions == 2)
  }

  test("stub decode derives deterministic dimensions") {
    val meta = MultimodalOps.decode(spark.createDataset(media)).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(0L).width == 700 % 640 && meta(0L).height == 700 % 480)
    assert(meta(0L).n_frames == 1, "image has one frame")
    assert(meta(2L).n_frames == 100 % 16 + 1)
  }

  test("frame sampling emits stride-spaced work units for videos only") {
    val meta = MultimodalOps.metadataExpr(spark.createDataset(media).toDF())
    val frames = MultimodalOps.sampleFrames(meta, stride = 2)
      .as[(Long, Int)].collect().toSeq
    assert(frames.forall(_._1 == 2L))
    assert(frames.map(_._2) == (0 until (100 % 16 + 1) by 2))
  }

  test("resize plan preserves aspect ratio and never upscales") {
    val meta = MultimodalOps.metadataExpr(spark.createDataset(media).toDF())
    val plan = MultimodalOps.resizePlan(meta, 30, 30).collect()
      .map(r => r.getAs[Long]("media_id") -> (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))).toMap
    val m0 = plan(0L) // 60x220 → scale = min(30/60, 30/220) = 0.136
    assert(m0._1 <= 30 && m0._2 <= 30)
    val m1 = plan(1L) // 6x6 → no upscale
    assert(m1 == ((6, 6)))
  }
}
