package graft

import graft.ops.MultimodalOps
import graft.search.MetricSearchOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Rounding.round // binary rounding, DuckDB-consistent (shadows functions.round)

/** Metric-tree scan shapes (SURVEY §2.1 S6/S8/S10), set ops (§2.7),
  * pagination (§2.6 O3), collect-to-array (§2.4 A5), window analytics
  * and the multimodal metadata plumbing — each with DuckDB oracle SQL.
  *
  * The tree table is synthesized deterministically from `events` (the
  * testdata has no tree table): one append-only row per event for the
  * metric name `<event_type>.u<user_id>`, with a status stream that
  * varies by event so `argMax(status, updated)` is actually exercised.
  */
private[graft] object TreeEntries {

  // one shared implementation of the nanos-timestamp handling (a known
  // trap — NOTES_r1): all entries files read events through SparkEntry
  private def events(s: SparkSession, dir: String): DataFrame =
    SparkEntry.events(s, dir)

  /** Append-only tree rows with time-varying statuses (SURVEY §1.1). */
  private def tree(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      concat(col("event_type"), lit(".u"), col("user_id")).as("name"),
      lit(2).as("level"),
      concat(col("event_type"), lit(".")).as("parent"),
      when(col("user_id") % 17 === 0, "BAN")
        .when(col("user_id") % 11 === 0 && col("event_id") % 2 === 0, "AUTO_HIDDEN")
        .when(col("user_id") % 13 === 0 && col("event_id") % 3 === 0, "HIDDEN")
        .otherwise("SIMPLE").as("status"),
      col("event_id").as("updated")
    )

  /** Shared oracle CTE mirroring [[tree]]. */
  private val treeCte =
    """tree AS (
      |  SELECT event_type || '.u' || CAST(user_id AS VARCHAR) AS name,
      |         2 AS level,
      |         event_type || '.' AS parent,
      |         CASE WHEN user_id % 17 = 0 THEN 'BAN'
      |              WHEN user_id % 11 = 0 AND event_id % 2 = 0 THEN 'AUTO_HIDDEN'
      |              WHEN user_id % 13 = 0 AND event_id % 3 = 0 THEN 'HIDDEN'
      |              ELSE 'SIMPLE' END AS status,
      |         event_id AS updated
      |  FROM events)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S6 — level scan with pre-agg status filter + argMax (tree bootstrap).
    "q13_tree_scan" -> ((s, dir) =>
      tree(s, dir)
        .filter(col("level") === 2 && col("status") =!= "AUTO_HIDDEN")
        .groupBy("name")
        .agg(max_by(col("status"), col("updated")).as("last_status"))),

    // S8 — dir-content scan: children of a parent set, latest status.
    "q14_dir_content" -> ((s, dir) =>
      tree(s, dir)
        .filter(col("parent").isin("click.", "error.") && col("status") =!= "AUTO_HIDDEN")
        .groupBy("parent", "name")
        .agg(max_by(col("status"), col("updated")).as("last_status"))),

    // S10 — paged semi-join + HAVING: still-banned names in a name page.
    "q15_banned_page" -> ((s, dir) => {
      val tr = tree(s, dir)
      val page = tr.filter(col("status") === "BAN").select("name").distinct()
        .orderBy("name").limit(20)
      tr.join(page, Seq("name"), "left_semi")
        .groupBy("name")
        .agg(max_by(col("status"), col("updated")).as("last_status"))
        .filter(col("last_status") === "BAN")
    }),

    // U1 — union of per-pattern search results, deduplicated.
    "q16_union_patterns" -> ((s, dir) => {
      val tr = tree(s, dir)
      MetricSearchOps.search(tr, "click.*")
        .union(MetricSearchOps.search(tr, "*.u1?"))
        .dropDuplicates("name", "status")
    }),

    // A5 — collect-to-ordered-series (groupArray equivalent), stringified
    // for engine-portable comparison.
    "q17_collect_series" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 86400)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      rolled.groupBy("event_type")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("bucket_ts"), col("v")))),
            p => p.getField("v").cast("string")), ",").as("series"))
    }),

    // Window analytics — latest-3 per user with lag delta (beyond the
    // reference's surface; standard engine capability).
    "q18_window_latest" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("sec").desc, col("event_id").desc)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"), col("sec"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .drop("sec")
    }),

    // O3 — keyset-free pagination: ORDER BY name LIMIT 50 OFFSET 50.
    // Native offset+limit plans as TakeOrderedAndProject (per-partition
    // top-100 then merge), unlike a global row_number window which moves
    // ALL rows to one partition.
    "q19_pagination" -> ((s, dir) =>
      events(s, dir)
        .select(concat(col("event_type"), lit(".u"), col("user_id")).as("name")).distinct()
        .orderBy("name").offset(50).limit(50)),

    // Multimodal metadata: opaque binary payload -> typed metadata +
    // resize plan (decode stubbed deterministically; see MultimodalOps).
    "q31_multimodal_meta" -> ((s, dir) => {
      val media = s.read.parquet(s"$dir/documents.parquet").select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload")
      )
      val meta = MultimodalOps.metadataExpr(media)
      meta.join(
        MultimodalOps.resizePlan(meta, 224, 224).select("media_id", "target_w", "target_h"),
        Seq("media_id"))
    }),

    // X-series scalar functions: name ops (X2), epoch→date (X5),
    // partition exprs toMonday/toYYYYMM (X7), portable shard hash (X8),
    // hostname escaping (X9).
    "q33_scalar_ops" -> ((s, dir) =>
      events(s, dir)
        .select(concat(col("event_type"), lit(".u"), col("user_id")).as("name"), col("sec"))
        .groupBy("name").agg(min(col("sec")).as("first_sec"))
        .select(
          col("name"),
          size(split(col("name"), "\\.")).as("level"),
          substring_index(col("name"), ".", -1).as("last_level"),
          concat(substring_index(col("name"), ".", 1), lit(".")).as("parent"),
          to_date(from_unixtime(col("first_sec"))).as("first_date"),
          date_trunc("week", to_timestamp(col("first_sec"))).cast("date").as("week_start"),
          date_format(to_timestamp(col("first_sec")), "yyyyMM").as("month_part"),
          (graft.functions.Md5PrefixExprs.md5Prefix(col("name"), 8) % 32).as("shard"),
          translate(col("name"), ".", "_").as("escaped")
        )),

    // Distinct aggregation (count distinct per group).
    "q34_count_distinct" -> ((s, dir) =>
      events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))),

    // ROLLUP hierarchy totals (beyond reference surface; standard OLAP).
    "q35_rollup_totals" -> ((s, dir) =>
      events(s, dir)
        .rollup(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))),

    // JSON property extraction (semi-structured props column).
    "q36_json_props" -> ((s, dir) =>
      events(s, dir)
        .select((get_json_object(col("props"), "$.k").cast("long") % 10).as("k"), col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))),

    // S7 — tree incremental scan: rows whose `updated` version falls in
    // the refresh window (with overlap, reference MetricSearch.java:356-391),
    // deduped to latest status.
    "q49_incremental_scan" -> ((s, dir) =>
      tree(s, dir)
        .filter(col("updated") >= 2000 && col("updated") < 4000)
        .groupBy("name")
        .agg(max_by(col("status"), col("updated")).as("last_status"),
          max(col("updated")).as("max_updated"))),

    // S3 — host-metric redirect as a pure column expression: second
    // level ending with "_srv" gains a HOST dir level.
    "q50_host_redirect" -> ((s, dir) =>
      events(s, dir)
        .select(concat(col("event_type"), lit(".h"), col("user_id"),
          when(col("user_id") % 3 === 0, "_srv").otherwise(""), lit(".requests")).as("name"))
        .distinct()
        .select(col("name"),
          graft.names.MetricNameCols.hostRedirect(col("name"), Seq("_srv"), "HOST").as("stored_name"))),

    // Graphite-style series transforms (the function layer graphite-web
    // applies over /metricData output): derivative, nonNegativeDerivative,
    // perSecond rate and a 4-point moving average — per-series windows
    // over the hourly rollup. Intermediates stay unrounded so both
    // engines fold identical raw doubles; only outputs round.
    "q51_series_transforms" -> ((s, dir) => {
      import graft.ops.SeriesOps
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(avg(col("value")).as("v"))
      val t = Seq[DataFrame => DataFrame](
        SeriesOps.derivative(_, "event_type", "bucket_ts", "v"),
        SeriesOps.nonNegativeDerivative(_, "event_type", "bucket_ts", "v"),
        SeriesOps.perSecond(_, 3600, "event_type", "bucket_ts", "v"),
        SeriesOps.movingAverage(_, 4, "event_type", "bucket_ts", "v", "moving_avg4")
      ).reduce(_ andThen _)(rolled)
      t.select(
        col("event_type"), col("bucket_ts"), round(col("v"), 4).as("v"),
        round(col("derivative"), 4).as("derivative"),
        round(col("nn_derivative"), 4).as("nn_derivative"),
        round(col("per_second"), 6).as("per_second"),
        round(col("moving_avg4"), 4).as("moving_avg4"))
    }),

    // Graphite summarize + timeShift + integral: 6-hour sum re-bucket,
    // shifted back a day (the "compare with yesterday" render), with a
    // per-series running total. ALL post-rollup arithmetic is integer:
    // the hourly avg is scaled to 1e-6-unit BIGINTs at the rollup, the
    // 6h re-bucket sums those longs (exact, order-independent — a
    // double sum here differs in the last ulp between Spark's fold
    // order and DuckDB's, which round(...,4) then amplifies), and the
    // running total window-sums 1e-4-unit longs. Doubles reappear only
    // in the final /10000.0 projection, identical on both engines.
    "q55_summarize_shift" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bucket_ts"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")) * 1000000).cast("long").as("vu"))
      val sum6h = rolled
        .groupBy(col("event_type"),
          (col("bucket_ts") - (col("bucket_ts") % 21600)).cast("long").as("bucket_ts"))
        .agg(sum(col("vu")).as("vu"))
      sum6h
        .withColumn("bucket_ts", (col("bucket_ts") - 86400).cast("long"))
        .withColumn("v4", round(col("vu") / 100.0).cast("long"))
        .withColumn("rt4", sum(col("v4")).over(w))
        .select(col("event_type"), col("bucket_ts"),
          (col("v4") / 10000.0).as("v6h"),
          (col("rt4") / 10000.0).as("running_total"))
    }),

    // Graphite keepLastValue: forward-fill gaps in the dense grid with
    // the last seen value per series (bounded variants would add a
    // rows-between limit). Window ignoreNulls carry-forward per metric.
    "q53_forward_fill" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_type"), col("sec"), col("value"))
      val rolled = e
        .filter(col("sec") >= 1704844800L && col("sec") < 1705708800L)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 21600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      val grid = e.select("event_type").distinct()
        .select(col("event_type"),
          explode(sequence(lit(1704844800L), lit(1705708800L - 21600L), lit(21600L))).as("bucket_ts"))
      val sparse = grid.join(rolled, Seq("event_type", "bucket_ts"), "left")
      graft.ops.SeriesOps.keepLastValue(sparse, "event_type", "bucket_ts", "v", "filled")
    }),

    // Graphite exponentialMovingAverage: the sequential EWMA recursion
    // folds per collapsed series (SeriesOps.ewma); the oracle replays
    // it with a recursive CTE. Rollup inputs round to 4dp FIRST so both
    // engines fold bit-identical doubles through the recursion.
    "q67_ewma" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.ewma(rolled, 0.3, "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("bucket_ts"), col("v"),
          round(col("ewma"), 4).as("ewma"))
    }),

    // Graphite series-filter composition over 500 user series:
    // averageAbove(50) then highestMax(3) — whole-series admission by
    // per-series stats, the keys broadcast back against the point rows.
    "q68_top_series" -> ((s, dir) => {
      import graft.ops.SeriesOps
      val rolled = events(s, dir)
        .groupBy(concat(col("event_type"), lit(".u"),
            (col("user_id") % 100).cast("string")).as("metric"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      val passed = SeriesOps.filterSeries(rolled, "avg", 50.0, "metric", "bucket_ts", "v")
      SeriesOps.topKSeries(passed, "max", 3, "metric", "bucket_ts", "v")
    }),

    // Holt linear (double-exponential) smoothing: level + trend fold
    // per collapsed series, one-step forecast = level + trend — the
    // deseasonalized core of graphite holtWintersForecast. The oracle
    // carries BOTH recursion states through a recursive CTE.
    "q72_holt_linear" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.holtLinear(rolled, 0.5, 0.3, "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("bucket_ts"), col("v"),
          round(col("level"), 4).as("level"),
          round(col("trend"), 4).as("trend"),
          round(col("level") + col("trend"), 4).as("forecast"))
    }),

    // Moving-stats anomaly detection: trailing 6-point mean/stddev from
    // explicit n/Σv/Σv² windows (the oracle spells the same formula) and
    // a |z| > 2 flag per point.
    "q69_anomaly" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.anomalies(rolled, 6, 2.0, "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("bucket_ts"), col("v"),
          round(col("moving_mean"), 4).as("moving_mean"),
          round(col("moving_sd"), 4).as("moving_sd"),
          round(col("z"), 3).as("z"),
          col("is_anomaly"))
    }),

    // Graphite groupByNodes/sumSeries: collapse 500 user series to
    // their first name level, summing pointwise per timestamp.
    "q73_group_by_node" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(concat(col("event_type"), lit(".u"),
            (col("user_id") % 100).cast("string")).as("metric"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.groupByNodes(rolled, Seq(0), "sum", "metric", "bucket_ts", "v")
        .select(col("metric"), col("bucket_ts"), round(col("v"), 4).as("v"))
    }),

    // Graphite asPercent: each event type's share of the per-bucket
    // total — one window keyed by timestamp.
    "q74_as_percent" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.asPercent(rolled, "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("bucket_ts"), col("v"),
          round(col("pct"), 4).as("pct"))
    }),

    // Graphite linearRegression: per-series least-squares slope and
    // intercept over the hourly rollup, x in bucket units so the
    // normal equations stay conditioned.
    "q78_linreg" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.linearTrend(rolled, 1704844800L, 3600L,
          "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("n_points"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 4).as("intercept"))
    }),

    // Graphite removeAbovePercentile: drop each series' points above
    // its own exact p95; the 4dp-rounded cutoff is the compare key in
    // both engines so the boundary can't wobble.
    "q79_remove_above_pct" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.removeAbovePercentile(rolled, 0.95,
        "event_type", "bucket_ts", "v")
    }),

    // Graphite hitcount: re-bucket the hourly rate series into 6h
    // buckets of total hits (sum(rate)·step).
    "q80_hitcount" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.hitcount(rolled, 21600L, 3600L,
          "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("bucket_ts"),
          round(col("hits"), 4).as("hits"))
    }),

    // Graphite divideSeries: every event type's hourly series over the
    // 'view' reference series — left join on ts keeps the dividend
    // grid; zero/missing divisor points go null.
    "q81_divide_series" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      val ref = rolled.filter(col("event_type") === "view")
        .select(col("bucket_ts"), col("v"))
      graft.ops.SeriesOps.divideSeries(rolled, ref, byKey = false,
          "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("bucket_ts"), col("v"),
          round(col("ratio"), 6).as("ratio"))
    }),

    // Graphite movingMedian: 6-point trailing median over the hourly
    // rollup — robust smoothing, exact interpolated median.
    "q85_moving_median" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.movingMedian(rolled, 6, "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("bucket_ts"), col("v"),
          round(col("moving_median"), 4).as("moving_median"))
    }),

    // Graphite timeStack: overlay the 3 previous days of each hourly
    // series onto the current axis (shift_idx 0..2), window-filtered.
    "q91_time_stack" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.timeStack(rolled, 86400L, 3, "event_type", "bucket_ts", "v")
        .filter(col("bucket_ts") >= 1705276800L && col("bucket_ts") < 1705363200L)
    }),

    // Graphite holtWintersForecast: additive triple smoothing with a
    // 24-slot (daily-on-hourly) seasonal vector. Dyadic α/β/γ so the
    // oracle's (1−p) literals are exact in binary and the recursive-CTE
    // replay folds bit-identical doubles.
    "q92_holt_winters" -> ((s, dir) => {
      val rolled = events(s, dir)
        .groupBy(col("event_type"),
          (col("sec") - (col("sec") % 3600)).cast("long").as("bucket_ts"))
        .agg(round(avg(col("value")), 4).as("v"))
      graft.ops.SeriesOps.holtWinters(rolled, 0.25, 0.125, 0.25, 24,
        "event_type", "bucket_ts", "v")
        .select(col("event_type"), col("bucket_ts"), col("v"),
          round(col("level"), 4).as("level"),
          round(col("trend"), 4).as("trend"),
          round(col("seasonal"), 4).as("seasonal"),
          round(col("forecast"), 4).as("forecast"))
    }),

    // Multimodal frame sampling: per-video frame work units.
    "q32_frame_sample" -> ((s, dir) => {
      val media = s.read.parquet(s"$dir/documents.parquet").select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload")
      )
      MultimodalOps.sampleFrames(MultimodalOps.metadataExpr(media))
    })
  )

  val oracle: Map[String, String] = Map(
    "q13_tree_scan" ->
      s"""WITH $treeCte
         |SELECT name, arg_max(status, updated) AS last_status
         |FROM tree WHERE level = 2 AND status != 'AUTO_HIDDEN' GROUP BY name""".stripMargin,

    "q14_dir_content" ->
      s"""WITH $treeCte
         |SELECT parent, name, arg_max(status, updated) AS last_status
         |FROM tree WHERE parent IN ('click.', 'error.') AND status != 'AUTO_HIDDEN'
         |GROUP BY parent, name""".stripMargin,

    "q15_banned_page" ->
      s"""WITH $treeCte
         |SELECT name, arg_max(status, updated) AS last_status
         |FROM tree
         |WHERE name IN (SELECT DISTINCT name FROM tree WHERE status = 'BAN' ORDER BY name LIMIT 20)
         |GROUP BY name HAVING arg_max(status, updated) = 'BAN'""".stripMargin,

    "q16_union_patterns" ->
      s"""WITH $treeCte,
         |cur AS (SELECT name, arg_max(status, updated) AS status FROM tree GROUP BY name),
         |vis AS (SELECT name, status FROM cur WHERE status IN ('SIMPLE', 'APPROVED'))
         |SELECT DISTINCT name, status FROM vis
         |WHERE regexp_matches(name, '^click\\.[^.]*\\.?$$')
         |   OR regexp_matches(name, '^[^.]*\\.u1[^.]\\.?$$')""".stripMargin,

    "q17_collect_series" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 86400) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2)
        |SELECT event_type, string_agg(CAST(v AS VARCHAR), ',' ORDER BY bucket_ts) AS series
        |FROM r GROUP BY event_type""".stripMargin,

    "q18_window_latest" ->
      """WITH e AS (SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |w AS (SELECT user_id, event_id, value,
        |        lag(value) OVER (PARTITION BY user_id ORDER BY sec DESC, event_id DESC) AS prev_value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY sec DESC, event_id DESC) AS rn
        |      FROM e)
        |SELECT user_id, event_id, value, prev_value, CAST(rn AS INTEGER) AS rn
        |FROM w WHERE rn <= 3""".stripMargin,

    "q19_pagination" ->
      """SELECT name FROM (
        |  SELECT DISTINCT event_type || '.u' || CAST(user_id AS VARCHAR) AS name FROM events)
        |ORDER BY name LIMIT 50 OFFSET 50""".stripMargin,

    "q49_incremental_scan" ->
      s"""WITH $treeCte
         |SELECT name, arg_max(status, updated) AS last_status, max(updated) AS max_updated
         |FROM tree WHERE updated >= 2000 AND updated < 4000 GROUP BY name""".stripMargin,

    "q50_host_redirect" ->
      """WITH names AS (
        |  SELECT DISTINCT event_type || '.h' || CAST(user_id AS VARCHAR)
        |    || CASE WHEN user_id % 3 = 0 THEN '_srv' ELSE '' END || '.requests' AS name
        |  FROM events)
        |SELECT name,
        |  CASE WHEN strpos(name, '.') > 0
        |        AND strpos(substr(name, strpos(name, '.') + 1), '.') > 0
        |        AND ends_with(string_split(name, '.')[2], '_srv')
        |       THEN substr(name, 1, strpos(name, '.')) || 'HOST' || substr(name, strpos(name, '.'))
        |       ELSE name END AS stored_name
        |FROM names""".stripMargin,

    "q51_series_transforms" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, avg(value) AS v
        |      FROM e GROUP BY 1, 2)
        |SELECT event_type, bucket_ts, round(v, 4) AS v,
        |  round(v - lag(v) OVER w, 4) AS derivative,
        |  round(CASE WHEN v - lag(v) OVER w >= 0 THEN v - lag(v) OVER w END, 4) AS nn_derivative,
        |  round((v - lag(v) OVER w) / 3600.0, 6) AS per_second,
        |  round(avg(v) OVER (PARTITION BY event_type ORDER BY bucket_ts
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg4
        |FROM r WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)""".stripMargin,

    "q55_summarize_shift" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |h AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts,
        |             CAST(round(avg(value) * 1000000) AS BIGINT) AS vu
        |      FROM e GROUP BY 1, 2),
        |s6 AS (SELECT event_type, bucket_ts - (bucket_ts % 21600) AS b6,
        |              CAST(sum(vu) AS BIGINT) AS vu
        |       FROM h GROUP BY 1, 2),
        |sh AS (SELECT event_type, b6 - 86400 AS bucket_ts,
        |              CAST(round(vu / 100.0) AS BIGINT) AS v4 FROM s6)
        |SELECT event_type, bucket_ts, v4 / 10000.0 AS v6h,
        |  CAST(sum(v4) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS BIGINT) / 10000.0 AS running_total
        |FROM sh""".stripMargin,

    "q53_forward_fill" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 21600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e WHERE sec >= 1704844800 AND sec < 1705708800 GROUP BY 1, 2),
        |grid AS (SELECT event_type, g AS bucket_ts
        |         FROM (SELECT DISTINCT event_type FROM e)
        |         CROSS JOIN range(1704844800, 1705708800, 21600) t(g)),
        |sp AS (SELECT grid.event_type, grid.bucket_ts, r.v
        |       FROM grid LEFT JOIN r USING (event_type, bucket_ts))
        |SELECT event_type, bucket_ts, v,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket_ts
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM sp""".stripMargin,

    "q67_ewma" ->
      """WITH RECURSIVE
        |e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2),
        |n AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS rn FROM r),
        |s AS (
        |  SELECT event_type, rn, bucket_ts, v, v AS ewma FROM n WHERE rn = 1
        |  UNION ALL
        |  SELECT n.event_type, n.rn, n.bucket_ts, n.v, 0.3 * n.v + (1 - 0.3) * s.ewma
        |  FROM n JOIN s ON n.event_type = s.event_type AND n.rn = s.rn + 1)
        |SELECT event_type, bucket_ts, v, round(ewma, 4) AS ewma FROM s""".stripMargin,

    "q68_top_series" ->
      """WITH e AS (SELECT event_type || '.u' || CAST(user_id % 100 AS VARCHAR) AS metric,
        |                 CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT metric, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2),
        |passed AS (SELECT metric FROM r GROUP BY metric HAVING avg(v) >= 50.0),
        |f AS (SELECT r.* FROM r WHERE metric IN (SELECT metric FROM passed)),
        |stat AS (SELECT metric, max(v) AS stat FROM f GROUP BY 1),
        |top AS (SELECT metric FROM stat ORDER BY stat DESC, metric LIMIT 3)
        |SELECT f.* FROM f WHERE metric IN (SELECT metric FROM top)""".stripMargin,

    "q72_holt_linear" ->
      """WITH RECURSIVE
        |e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2),
        |n AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS rn FROM r),
        |s AS (
        |  SELECT event_type, rn, bucket_ts, v, v AS level, CAST(0.0 AS DOUBLE) AS trend
        |  FROM n WHERE rn = 1
        |  UNION ALL
        |  SELECT n.event_type, n.rn, n.bucket_ts, n.v,
        |         0.5 * n.v + (1 - 0.5) * (s.level + s.trend),
        |         0.3 * ((0.5 * n.v + (1 - 0.5) * (s.level + s.trend)) - s.level) + (1 - 0.3) * s.trend
        |  FROM n JOIN s ON n.event_type = s.event_type AND n.rn = s.rn + 1)
        |SELECT event_type, bucket_ts, v, round(level, 4) AS level, round(trend, 4) AS trend,
        |       round(level + trend, 4) AS forecast
        |FROM s""".stripMargin,

    "q69_anomaly" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2),
        |n AS (SELECT event_type, bucket_ts, v,
        |             count(v) OVER w AS wn, sum(v) OVER w AS ws, sum(v*v) OVER w AS wss
        |      FROM r WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
        |                          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
        |d AS (SELECT event_type, bucket_ts, v, ws / wn AS mean,
        |             CASE WHEN wn > 1 THEN sqrt(greatest((wss - ws*ws/wn) / (wn-1), 0.0)) END AS sd
        |      FROM n),
        |z AS (SELECT event_type, bucket_ts, v, mean, sd,
        |             CASE WHEN sd > 0 THEN (v - mean) / sd END AS z FROM d)
        |SELECT event_type, bucket_ts, v, round(mean, 4) AS moving_mean,
        |       round(sd, 4) AS moving_sd, round(z, 3) AS z,
        |       coalesce(abs(z) > 2.0, false) AS is_anomaly FROM z""".stripMargin,

    "q73_group_by_node" ->
      """WITH e AS (SELECT event_type || '.u' || CAST(user_id % 100 AS VARCHAR) AS metric,
        |                 CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT metric, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2)
        |SELECT split_part(metric, '.', 1) AS metric, bucket_ts, round(sum(v), 4) AS v
        |FROM r GROUP BY 1, 2""".stripMargin,

    "q74_as_percent" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2)
        |SELECT event_type, bucket_ts, v,
        |       round(v / sum(v) OVER (PARTITION BY bucket_ts) * 100, 4) AS pct
        |FROM r""".stripMargin,

    "q78_linreg" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2),
        |x AS (SELECT event_type, CAST(bucket_ts - 1704844800 AS DOUBLE) / 3600 AS x, v FROM r),
        |s AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |             sum(x) AS sx, sum(x * x) AS sxx, sum(v) AS sv, sum(x * v) AS sxv
        |      FROM x GROUP BY 1),
        |t AS (SELECT event_type, n, sx, sv,
        |             CASE WHEN n * sxx - sx * sx <> 0
        |               THEN (n * sxv - sx * sv) / (n * sxx - sx * sx) END AS slope
        |      FROM s)
        |SELECT event_type, CAST(n AS BIGINT) AS n_points,
        |       round(slope, 6) AS slope,
        |       round((sv - slope * sx) / n, 4) AS intercept
        |FROM t""".stripMargin,

    "q79_remove_above_pct" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, round(quantile_cont(v, 0.95), 4) AS cutoff FROM r GROUP BY 1)
        |SELECT event_type, bucket_ts, v, cutoff
        |FROM r JOIN c USING (event_type) WHERE v <= cutoff""".stripMargin,

    "q80_hitcount" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2)
        |SELECT event_type, bucket_ts - (bucket_ts % 21600) AS bucket_ts,
        |       round(sum(v) * 3600, 4) AS hits
        |FROM r GROUP BY event_type, bucket_ts - (bucket_ts % 21600)""".stripMargin,

    // Holt-Winters replay: the seasonal vector rides the recursive CTE as
    // a DOUBLE list, rebuilt per step by slice-concat (no index lambda).
    // snew/bnew/cnew are textual inlines of the same dyadic-coefficient
    // arithmetic the Spark fold runs, so every state double is
    // bit-identical between engines and the 4dp rounding cannot diverge.
    "q92_holt_winters" -> {
      val m = 24
      val zeros = ("CAST(0.0 AS DOUBLE)" +: List.fill(m - 1)("0.0")).mkString("[", ", ", "]")
      val phase = s"((n.rn - 1) % $m)"
      val cprev = s"s.c[$phase + 1]"
      val snew = s"(0.25 * (n.v - $cprev) + 0.75 * (s.level + s.trend))"
      val bnew = s"(0.125 * ($snew - s.level) + 0.875 * s.trend)"
      val cnew = s"(0.25 * (n.v - $snew) + 0.75 * $cprev)"
      s"""WITH RECURSIVE
         |e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
         |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
         |      FROM e GROUP BY 1, 2),
         |n AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS rn FROM r),
         |s AS (
         |  SELECT event_type, rn, bucket_ts, v, v AS level, CAST(0.0 AS DOUBLE) AS trend,
         |         CAST(0.0 AS DOUBLE) AS seasonal, CAST(NULL AS DOUBLE) AS forecast,
         |         $zeros AS c
         |  FROM n WHERE rn = 1
         |  UNION ALL
         |  SELECT n.event_type, n.rn, n.bucket_ts, n.v,
         |         $snew, $bnew, $cnew,
         |         s.level + s.trend + $cprev,
         |         s.c[1:$phase] || [$cnew] || s.c[$phase + 2:]
         |  FROM n JOIN s ON n.event_type = s.event_type AND n.rn = s.rn + 1)
         |SELECT event_type, bucket_ts, v, round(level, 4) AS level, round(trend, 4) AS trend,
         |       round(seasonal, 4) AS seasonal, round(forecast, 4) AS forecast
         |FROM s""".stripMargin
    },

    "q91_time_stack" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2)
        |SELECT event_type, CAST(i AS INTEGER) AS shift_idx,
        |       bucket_ts + i * 86400 AS bucket_ts, v
        |FROM r CROSS JOIN range(3) t(i)
        |WHERE bucket_ts + i * 86400 >= 1705276800 AND bucket_ts + i * 86400 < 1705363200""".stripMargin,

    "q85_moving_median" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2)
        |SELECT event_type, bucket_ts, v,
        |       round(median(v) OVER (PARTITION BY event_type ORDER BY bucket_ts
        |                             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW), 4) AS moving_median
        |FROM r""".stripMargin,

    "q81_divide_series" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
        |r AS (SELECT event_type, sec - (sec % 3600) AS bucket_ts, round(avg(value), 4) AS v
        |      FROM e GROUP BY 1, 2),
        |ref AS (SELECT bucket_ts, v AS ref_v FROM r WHERE event_type = 'view')
        |SELECT r.event_type, r.bucket_ts, r.v,
        |       round(CASE WHEN ref_v <> 0 THEN r.v / ref_v END, 6) AS ratio
        |FROM r LEFT JOIN ref USING (bucket_ts)""".stripMargin,

    "q36_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k,
        |       count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,

    "q33_scalar_ops" ->
      """WITH names AS (
        |  SELECT event_type || '.u' || CAST(user_id AS VARCHAR) AS name,
        |         min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_sec
        |  FROM events GROUP BY 1)
        |SELECT name,
        |  CAST(len(string_split(name, '.')) AS INTEGER) AS level,
        |  string_split(name, '.')[-1] AS last_level,
        |  string_split(name, '.')[1] || '.' AS parent,
        |  CAST(make_timestamp(first_sec * 1000000) AS DATE) AS first_date,
        |  CAST(date_trunc('week', make_timestamp(first_sec * 1000000)) AS DATE) AS week_start,
        |  strftime(make_timestamp(first_sec * 1000000), '%Y%m') AS month_part,
        |  CAST(concat('0x', substr(md5(name), 1, 8)) AS BIGINT) % 32 AS shard,
        |  replace(name, '.', '_') AS escaped
        |FROM names""".stripMargin,

    "q34_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q35_rollup_totals" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY ROLLUP(event_type)""".stripMargin,

    "q31_multimodal_meta" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |         md5(text) AS content_hash,
        |         CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |         CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height,
        |         CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 16 + 1 ELSE 1 END AS INTEGER) AS n_frames
        |  FROM documents),
        |plan AS (
        |  SELECT media_id,
        |    CAST(round(width * least(224.0 / greatest(width, 1), 224.0 / greatest(height, 1), 1.0)) AS INTEGER) AS target_w,
        |    CAST(round(height * least(224.0 / greatest(width, 1), 224.0 / greatest(height, 1), 1.0)) AS INTEGER) AS target_h
        |  FROM meta)
        |SELECT meta.media_id, kind, byte_len, content_hash, width, height, n_frames, target_w, target_h
        |FROM meta JOIN plan ON meta.media_id = plan.media_id""".stripMargin,

    "q32_frame_sample" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id,
        |         CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, CAST(f AS INTEGER) AS frame_idx
        |FROM (SELECT media_id, unnest(generate_series(0, n_frames - 1, 4)) AS f
        |      FROM meta WHERE n_frames > 0)""".stripMargin
  )
}
