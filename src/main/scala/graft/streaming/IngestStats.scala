package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Self-monitoring (SURVEY §2.4 A8; reference
  * `statistics/StatisticsCounter.java:90-145` flushes counter metrics
  * every N seconds): a `StreamingQueryListener` that appends one stats
  * row per micro-batch — the engine monitors itself with its own
  * metric-point schema, so its health series are queryable through the
  * same metricData path as user data.
  */
final class IngestStatsListener(spark: SparkSession, statsPath: String,
                                prefix: String = "one_min.graft.ingest",
                                onlyQueryName: Option[String] = None)
    extends StreamingQueryListener {

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    // listeners are session-global: with several streaming queries
    // running, either scope to one query by name or qualify the metric
    // prefix per query — otherwise unrelated queries' numbers interleave
    // under the same series names
    if (onlyQueryName.exists(n => n != p.name)) return
    // unscoped listener + named query: qualify the series so two queries
    // never write under the same names (unnamed queries keep the bare
    // prefix — single-pipeline deployments stay unchanged)
    val pfx = prefix + (if (onlyQueryName.isEmpty && p.name != null && p.name.nonEmpty)
      "." + p.name.replaceAll("[^-_0-9a-zA-Z]", "_") else "")
    val now = (System.currentTimeMillis() / 1000).toInt
    val rows = Seq(
      (s"$pfx.input_rows", p.numInputRows.toDouble),
      (s"$pfx.rows_per_sec", Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0)),
      (s"$pfx.batch_id", p.batchId.toDouble)
    )
    import spark.implicits._
    // batch_id rides as its own column (uniform stats-table schema with
    // recordRefusals' rows, whose replay-dedup key it is)
    rows.toDF("metric", "value")
      .select(col("metric"), col("value"),
        lit(now).as("timestamp"),
        to_date(from_unixtime(lit(now.toLong))).as("date"),
        lit(now).as("updated"),
        lit(p.batchId).as("batch_id"))
      .coalesce(1)
      .write.mode("append").partitionBy("date").parquet(statsPath)
  }
}

/** Watermarked sliding-window aggregation over the point stream — the
  * streaming analytics surface the reference lacks (SURVEY §2.9 T7
  * "absent"), provided as a first-class capability: per-metric
  * windowed avg/min/max/count with bounded state.
  */
object WindowedStats {
  /** points must carry (metric, value, event_time: timestamp). */
  def slidingAgg(points: DataFrame, window_ : String = "5 minutes",
                 slide: String = "1 minute", watermark: String = "10 minutes"): DataFrame =
    points
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_, slide), col("metric"))
      .agg(
        avg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("n")
      )
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("metric"), col("avg_value"), col("min_value"), col("max_value"), col("n"))
}
