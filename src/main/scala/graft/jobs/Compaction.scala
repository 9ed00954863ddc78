package graft.jobs

import graft.query.MetricQuery
import graft.retention.RetentionResolver
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Rollup-at-rest compaction — the Spark-native replacement for
  * GraphiteMergeTree background merges (reference `doc/install.md:181`,
  * SURVEY.md §4 P4/P5). Correctness never depends on it (every read
  * re-applies A1 dedup + A3 rollup); it reclaims storage and read cost
  * for aged partitions by rewriting them deduped and rolled up to the
  * retention step for their age.
  *
  * Scale design: operates partition-by-partition on the `date` layout
  * (only aged partitions are touched — partition pruning bounds the
  * rewrite), output is written sorted by (metric, timestamp) so parquet
  * row-group min/max stats give primary-key-range skipping on reads
  * (the MergeTree ORDER BY equivalent, SURVEY §4 P2).
  */
final class Compaction(resolver: RetentionResolver) extends Serializable {

  /** Compact one partition of the data table to `step` seconds using each
    * metric's retention function. Returns the compacted frame: one row
    * per (metric, bucket), with `updated` collapsed to its max so
    * later-arriving duplicates still lose at read time.
    */
  def compactPartition(part: DataFrame, step: Int): DataFrame = {
    val spark = part.sparkSession
    import spark.implicits._
    // resolve each metric's rollup function via the broadcast rule table
    val res = resolver
    val fnFor = udf((m: String) => res.resolve(m).function)
    val withFn = part.withColumn("fn", fnFor(col("metric")))
    val deduped = withFn
      .groupBy(col("metric"), col("fn"), col("timestamp"))
      .agg(max_by(col("value"), col("updated")).as("value"), max(col("updated")).as("updated"))
    // one grouped pass per distinct function present (reference runs one
    // query per function group, MetricDataService.java:49-51)
    val fns = deduped.select("fn").distinct().as[String].collect().toSeq
    fns.map { fn =>
      val g = deduped.filter(col("fn") === fn)
        .groupBy(col("metric"), MetricQuery.bucket(col("timestamp"), step).as("timestamp"))
        .agg(
          MetricQuery.aggFor(fn, col("value"), col("updated")).as("value"),
          max(col("updated")).as("updated")
        )
      g
    }.reduce(_ unionByName _)
  }

  /** Rewrite every date partition older than `ageDays` at `step`
    * resolution. Parquet layout: `<root>/date=YYYY-MM-DD/`. Each
    * partition rewrites independently (restart-safe: a failed partition
    * leaves the original files in place via staging-dir swap).
    */
  def run(spark: SparkSession, root: String, ageDays: Int, step: Int,
          nowMillis: Long = System.currentTimeMillis()): Seq[String] = {
    val cutoff = java.time.LocalDate.ofEpochDay(nowMillis / 86400000L - ageDays)
    val fs = new java.io.File(root)
    val parts = Option(fs.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
      .map(_.getName.stripPrefix("date="))
      .filter(d => java.time.LocalDate.parse(d).isBefore(cutoff))
      .sorted.toSeq
    parts.foreach { d =>
      val src = s"$root/date=$d"
      val stage = s"$root/.compact_tmp_date=$d"
      val compacted = compactPartition(spark.read.parquet(src), step)
        .withColumn("date", lit(java.sql.Date.valueOf(d)))
        .sortWithinPartitions("metric", "timestamp")
      compacted.drop("date").write.mode(SaveMode.Overwrite).parquet(stage)
      // atomic-ish swap: remove originals, move staged files in
      val srcDir = new java.io.File(src)
      srcDir.listFiles().foreach(_.delete())
      new java.io.File(stage).listFiles().foreach { f =>
        f.renameTo(new java.io.File(srcDir, f.getName))
      }
      new java.io.File(stage).delete()
    }
    parts
  }
}
