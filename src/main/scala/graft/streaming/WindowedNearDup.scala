package graft.streaming

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed MinHash near-dup detection: emit candidate pairs
  * of documents whose signatures collide in an LSH band AND whose
  * event times lie within `horizon` of each other.
  *
  * Complements the other two streaming dedup shapes:
  * [[StreamDedup]] (exact fingerprint, keep-first) and
  * [[IncrementalDedup]] (near-dup admission against the whole stored
  * corpus). This one answers "what near-duplicates are flowing RIGHT
  * NOW" — burst detection (mirror storms, template floods) where the
  * pair itself is the signal — with state bounded by the watermark
  * horizon instead of corpus size.
  *
  * Scale shape: signatures are the map-only one-pass native expression
  * (no digest, no shuffle); the self-join keys on the short band
  * string, so stream-stream join state is (docs-in-horizon ×
  * bands) small fixed-width rows, cleaned up by the watermark + the
  * symmetric time-range condition. Per-band duplicate hits collapse
  * with a watermarked dropDuplicates on the pair key.
  */
final class WindowedNearDup(
    numHashes: Int = 16,
    bands: Int = 4,
    minhashSim: Double = 0.7,
    horizon: String = "10 minutes"
) extends Serializable {

  /** (id, ts, sig, band) per input row — map-only. */
  def signatures(docs: DataFrame, eventTimeCol: String = "ts",
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(eventTimeCol).as("ts"),
        graft.functions.ShingleExprs.minHashSig(
          TextOps.normalized(col(textCol)), 8, numHashes).as("sig"))
      .select(col("id"), col("ts"), col("sig"),
        explode(DedupOps.bandKeys(col("sig"), bands, numHashes / bands)).as("band"))

  /** Estimated Jaccard = fraction of agreeing signature positions. */
  private def estJaccard(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m)) / lit(numHashes.toDouble)

  /** Near-dup pairs within the horizon. Output: (id_a, id_b, ts_a,
    * est_jaccard) with id_a < id_b; each pair emitted once per
    * watermark window (band collisions deduped on the pair key).
    */
  def pairs(docs: DataFrame, eventTimeCol: String = "ts",
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = signatures(docs, eventTimeCol, idCol, textCol)
      .withWatermark("ts", horizon)
    val a = sigs.select(col("band").as("band_a"), col("id").as("id_a"), col("sig").as("sig_a"),
      col("ts").as("ts_a"))
    val b = sigs.select(col("band").as("band_b"), col("id").as("id_b"), col("sig").as("sig_b"),
      col("ts").as("ts_b"))
    // join state is bounded by the two event-time range constraints
    // (StreamingJoinHelper extracts them; it also logs a benign WARN
    // trying to derive a VALUE bound from id_a < id_b — ids are not
    // monotone in time, so no such bound exists)
    a.join(b,
        col("band_a") === col("band_b") &&
          col("id_a") < col("id_b") &&
          col("ts_b") >= col("ts_a") - expr(s"INTERVAL $horizon") &&
          col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizon"))
      .select(col("id_a"), col("id_b"), col("ts_a"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minhashSim) // project-then-filter: one HOF eval per pair
      .dropDuplicatesWithinWatermark(Seq("id_a", "id_b"))
  }
}
