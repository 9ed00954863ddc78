package graft

import graft.jobs.Compaction
import graft.query.MetricQuery
import graft.retention.{RetentionResolver, RetentionRule}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level compaction equivalence — P4/P5's correctness claim made
  * exact over the real events corpus:
  *
  *  1. DEDUP tier (step 1): reads re-apply A1 dedup + A3 rollup, so
  *     collapsing at-least-once duplicate versions at rest changes NO
  *     read of any shape (the q02/q03/q52 read shapes all pinned).
  *  2. ROLLUP tier (retention step): every read AT OR ABOVE the
  *     retention step with the metric's OWN retention function stays
  *     exact — avg@3600 after avg@3600-compaction serves the stored
  *     value; last@86400 after last@3600-compaction composes exactly
  *     (the max-updated row's bucket wins). Reads BELOW the retention
  *     step are the rollup ladder's documented loss, not a defect.
  *
  * Float discipline: min/max/last/count compare exactly (order-free
  * aggregates); avg/sum compare to 1e-9 — the compacted parquet layout
  * changes partial-aggregation order, and reassociated double sums are
  * not bit-claimable across layouts.
  */
class CompactionEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def dedup(df: DataFrame): DataFrame =
    df.groupBy("metric", "timestamp")
      .agg(max_by(col("value"), col("updated")).as("value"),
        max("updated").as("updated"))

  // the q02 shape: hourly avg after read-side dedup
  private def readAvg(df: DataFrame): DataFrame =
    dedup(df).groupBy(col("metric"), MetricQuery.bucket(col("timestamp"), 3600).as("ts"))
      .agg(avg("value").as("value"))
  // the q52 shape: daily 'last' (version-aware by itself)
  private def readLast(df: DataFrame): DataFrame =
    MetricQuery.rollup(df, "last", 86400)
  // the q03 shape: daily sum/min/max/count after read-side dedup
  private def readMulti(df: DataFrame): DataFrame =
    dedup(df).groupBy(col("metric"), MetricQuery.bucket(col("timestamp"), 86400).as("ts"))
      .agg(sum("value").as("s"), min("value").as("mn"), max("value").as("mx"),
        count(lit(1)).as("n"))

  /** Same key set, exact columns bit-equal, float columns within 1e-9. */
  private def agree(tag: String, pre: DataFrame, post: DataFrame,
                    exactCols: Seq[String], tolCols: Seq[String]): Unit = {
    val nPre = pre.count()
    assert(post.count() == nPre, s"$tag: row counts diverged")
    val renamed = post.columns.foldLeft(post)((d, c) =>
      if (c == "metric" || c == "ts") d else d.withColumnRenamed(c, s"__$c"))
    val j = pre.join(renamed, Seq("metric", "ts")).localCheckpoint(true)
    assert(j.count() == nPre, s"$tag: key sets diverged")
    exactCols.foreach { c =>
      val bad = j.filter(col(c) =!= col(s"__$c")).count()
      assert(bad == 0L, s"$tag: $bad rows diverged on exact column $c")
    }
    tolCols.foreach { c =>
      val mx = j.agg(max(abs(col(c) - col(s"__$c")))).as[Double].head()
      assert(mx <= 1e-9, s"$tag: float column $c drifted by $mx")
    }
  }

  test("dedup-tier then rollup-tier compaction preserve the exact read contracts") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val pts = SparkEntry.events(spark, dir)
      .filter(col("user_id") < 8 && col("event_type").isin("click", "error"))
      .select(concat(col("event_type"), lit(".u"), col("user_id")).as("metric"),
        col("value"), col("sec").cast("int").as("timestamp"),
        to_date(from_unixtime(col("sec"))).as("date"),
        col("event_id").cast("int").as("updated"))
    // at-least-once duplication: an exact replay (same version, same
    // value) AND a stale replay (older version, corrupted value) that
    // must lose everywhere — read-side and at-rest alike
    val corpus = pts
      .unionByName(pts)
      .unionByName(pts
        .withColumn("updated", col("updated") - 1000000)
        .withColumn("value", col("value") + 999.0))
    val root = java.nio.file.Files.createTempDirectory("graft_compeq").toString + "/data"
    corpus.write.partitionBy("date").parquet(root)
    def table(): DataFrame = spark.read.parquet(root)
    val nRaw = table().count()

    // snapshot every read BEFORE any rewrite (eager — a lazy frame
    // would silently re-read the rewritten files)
    val preAvg = readAvg(table()).localCheckpoint(true)
    val preLast = readLast(table()).localCheckpoint(true)
    val preMulti = readMulti(table()).localCheckpoint(true)

    val resolver = new RetentionResolver(Seq(
      RetentionRule("^click\\.", isDefault = false, "avg", Seq(0 -> 3600)),
      RetentionRule("^error\\.", isDefault = false, "last", Seq(0 -> 3600)),
      RetentionRule(".*", isDefault = true, "avg", Seq(0 -> 3600))))
    val comp = new Compaction(resolver)
    val now = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime

    // ---- tier 1: dedup-only rewrite (step 1) --------------------------
    val doneA = comp.run(spark, root, ageDays = 0, step = 1, nowMillis = now)
    assert(doneA.nonEmpty, "no partitions rewritten")
    val nDeduped = table().count()
    assert(nDeduped * 3 == nRaw, "dedup tier must fold the two replays")
    agree("dedup/avg", preAvg, readAvg(table()), Nil, Seq("value"))
    agree("dedup/last", preLast, readLast(table()), Seq("value"), Nil)
    agree("dedup/multi", preMulti, readMulti(table()),
      Seq("mn", "mx", "n"), Seq("s"))

    // ---- tier 2: retention rollup (each metric's own fn at 3600) ------
    // exact row contract: one row per (metric, 3600-bucket) — at this
    // corpus density that may equal the deduped count (sparse metrics),
    // so assert the precise bucket count rather than strict shrinkage
    val expectedBuckets = dedup(table())
      .select(col("metric"), MetricQuery.bucket(col("timestamp"), 3600)).distinct().count()
    comp.run(spark, root, ageDays = 0, step = 3600, nowMillis = now)
    assert(table().count() == expectedBuckets, "rollup tier must land one row per bucket")
    // reads at >= the retention step with the metric's own function
    // stay exact; finer-grained reads are the ladder's documented loss
    agree("rollup/avg@3600(click)",
      preAvg.filter(col("metric").startsWith("click.")),
      readAvg(table()).filter(col("metric").startsWith("click.")),
      Nil, Seq("value"))
    agree("rollup/last@86400(error)",
      preLast.filter(col("metric").startsWith("error.")),
      readLast(table()).filter(col("metric").startsWith("error.")),
      Seq("value"), Nil)
  }
}
