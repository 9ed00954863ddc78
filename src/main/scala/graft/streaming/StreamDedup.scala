package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup for document pipelines: keep the first arrival
  * of each content fingerprint, with state bounded by a watermark.
  *
  * Batch counterpart: `ops.DedupOps.exactDedup`. The streaming form is
  * what a continuously-ingesting training pipeline runs: late copies of
  * a document (mirrors, refetches, retries) arrive across micro-batches,
  * so dedup needs cross-batch state — and UNBOUNDED state is exactly
  * what kills a 100 TB stream, so the watermark caps how long a
  * fingerprint is remembered. Duplicates separated by more than the
  * watermark horizon pass through (and collapse in the read-side /
  * compaction dedup, same at-least-once + read-dedup contract the
  * ingest path already follows — SURVEY §2.9 T4).
  */
object StreamDedup {

  /** Fingerprint each document (md5 of normalized text — identical to
    * the batch fingerprint) and keep the first arrival per fingerprint
    * within the watermark window. `eventTimeCol` must be a timestamp
    * column; rows older than the watermark horizon are dropped by the
    * stateful operator, which is what bounds the dedup state.
    */
  def dedupStream(docs: DataFrame, eventTimeCol: String, textCol: String = "text",
                  watermark: String = "1 hour"): DataFrame = {
    // null text carries no content to dedup on: key those rows by a
    // per-row uuid so they pass through instead of collapsing into one
    // null-key group (replays may re-emit them — the at-least-once +
    // read-side-dedup contract already covers that)
    val key = coalesce(TextOps.fingerprint(col(textCol)), concat(lit("null:"), expr("uuid()")))
    docs
      .withColumn("__graft_fp", key)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__graft_fp"))
      .drop("__graft_fp")
  }

  /** Variant keyed on an explicit id column (url/doc key dedup) instead
    * of content fingerprint.
    */
  def dedupStreamByKey(docs: DataFrame, eventTimeCol: String, keyCols: Seq[String],
                       watermark: String = "1 hour"): DataFrame =
    docs.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
