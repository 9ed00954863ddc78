package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.ops.Rounding.round // binary rounding, DuckDB-consistent (shadows functions.round)

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` payload column with a
  * typed metadata struct; decode / feature-extract / resize / frame-
  * sample run per-partition in batches so a real decoder (JNI image lib,
  * ffmpeg pipe) slots in without touching the pipeline shape.
  *
  * The decoders here are STUBS — this container has no image/audio
  * libraries — but deterministic ones, so the Spark-side plumbing
  * (schema, partitioning, batch shape, column contracts) is fully
  * testable. Swap [[MediaDecoder]] for a real implementation in
  * production; nothing else changes.
  */
object MultimodalOps {

  /** One media row: payload is opaque bytes; `kind` ∈ image|audio|video. */
  final case class MediaItem(media_id: Long, kind: String, payload: Array[Byte])

  final case class DecodedMeta(
      media_id: Long,
      kind: String,
      byte_len: Long,
      content_hash: String,
      width: Int,
      height: Int,
      n_frames: Int
  )

  /** Batch decoder contract: one call per partition-batch, never per row —
    * the shape a real (expensive, library-backed) decoder needs.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(items: Iterator[MediaItem]): Iterator[DecodedMeta]
  }

  /** Deterministic stub: metadata derived from payload bytes only.
    * A real decoder would parse the container format here (STUB).
    */
  object StubDecoder extends MediaDecoder {
    override def decodeBatch(items: Iterator[MediaItem]): Iterator[DecodedMeta] =
      items.map { m =>
        val len = m.payload.length.toLong
        val md = java.security.MessageDigest.getInstance("MD5").digest(m.payload)
        val hash = md.map("%02x".format(_)).mkString
        DecodedMeta(m.media_id, m.kind, len, hash,
          width = (len % 640).toInt, height = (len % 480).toInt,
          n_frames = if (m.kind == "video") (len % 16).toInt + 1 else 1)
      }
  }

  /** Decode: per-partition batched map — the `mapInPandas` equivalent in
    * Scala Spark. Partition count is preserved; each partition makes ONE
    * decoder call with an iterator (no per-row decoder setup).
    */
  def decode(media: Dataset[MediaItem], decoder: MediaDecoder = StubDecoder): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => decoder.decodeBatch(it))
  }

  /** Pure-expression metadata path (no decoder): byte length + content
    * hash + stubbed dimensions, for engines/oracles that can't run the
    * batch decoder. Must agree with [[StubDecoder]] (tested).
    */
  def metadataExpr(df: DataFrame, payloadCol: String = "payload", kindCol: String = "kind"): DataFrame =
    df.select(
      col("media_id"),
      col(kindCol).as("kind"),
      octet_length(col(payloadCol)).cast("long").as("byte_len"),
      md5(col(payloadCol)).as("content_hash"),
      (octet_length(col(payloadCol)) % 640).cast("int").as("width"),
      (octet_length(col(payloadCol)) % 480).cast("int").as("height"),
      when(col(kindCol) === "video", (octet_length(col(payloadCol)) % 16 + 1))
        .otherwise(1).cast("int").as("n_frames")
    )

  /** Frame sampling plan for video rows: every `stride`-th frame index,
    * exploded to (media_id, frame_idx) — the unit of work a frame
    * decoder consumes. Map-side only; no shuffle.
    */
  def sampleFrames(meta: DataFrame, stride: Int = 4): DataFrame =
    meta.filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize plan: target box (maxW, maxH) preserving aspect ratio —
    * metadata-only arithmetic; the pixel work happens in the decoder
    * of the next stage (STUB).
    */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scaleW = lit(maxW.toDouble) / greatest(col("width").cast("double"), lit(1.0))
    val scaleH = lit(maxH.toDouble) / greatest(col("height").cast("double"), lit(1.0))
    val scale = least(scaleW, scaleH, lit(1.0))
    meta.select(col("media_id"), col("width"), col("height"),
      round(col("width") * scale).cast("int").as("target_w"),
      round(col("height") * scale).cast("int").as("target_h"))
  }
}
