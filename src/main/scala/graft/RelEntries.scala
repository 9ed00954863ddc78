package graft

import graft.ops.{RelOps, SketchOps}
import graft.query.{MetricQuery, QueryParams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Rounding.round // binary rounding, DuckDB-consistent (shadows functions.round)

/** Relational-extension queries: as-of join, interval join,
  * sessionization, pivot, cube/grouping sets, exact percentiles, and
  * the flagship /metricData series path end-to-end — each with DuckDB
  * oracle SQL.
  */
private[graft] object RelEntries {

  // shared nanos-timestamp handling — see SparkEntry.events
  private def events(s: SparkSession, dir: String): DataFrame =
    SparkEntry.events(s, dir)

  // probe times inside the events range (Jan 2024)
  private val ProbeTimes = Seq(1704500000L, 1705500000L, 1706500000L)
  // 10 two-day maintenance windows, every 3 days from the range start
  private val Windows: Seq[(Int, Long, Long)] =
    (0 until 10).map(k => (k, 1704067200L + k * 259200L, 1704067200L + k * 259200L + 172800L))
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Earliest-chain funnel CTEs (view → click → purchase) shared by
    * the q162 level rollup and the q170 conversion report.
    */
  private val funnelCtes =
    """e AS (SELECT user_id AS u, event_type AS t,
      |       CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
      |m1 AS (SELECT u, min(s) AS m1 FROM e WHERE t = 'view' GROUP BY u),
      |m2 AS (SELECT e.u, m1.m1, min(s) AS m2 FROM e JOIN m1 ON e.u = m1.u
      |       WHERE t = 'click' AND s > m1.m1 GROUP BY e.u, m1.m1),
      |m3 AS (SELECT e.u, m2.m1, min(s) AS m3 FROM e JOIN m2 ON e.u = m2.u
      |       WHERE t = 'purchase' AND s > m2.m2 GROUP BY e.u, m2.m1)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: per (user, probe time) the latest event value <= t.
    // Events deduped to one row per (user, sec) first so ties are
    // deterministic on both engines.
    "q39_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
        .groupBy(col("user_id"), col("sec"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      val probes = ev.select("user_id").distinct()
        .select(col("user_id"), explode(lit(ProbeTimes.toArray)).as("probe_ts"))
      RelOps.asofJoin(probes, ev, Seq("user_id"), "probe_ts", "sec", "value")
        .withColumn("asof_value", round(col("asof_value"), 4))
    }),

    // Forward as-of with tolerance (pandas merge_asof surface): nearest
    // event AT OR AFTER each probe, nulled when farther than 1 hour.
    "q60_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
        .groupBy(col("user_id"), col("sec"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      val probes = ev.select("user_id").distinct()
        .select(col("user_id"), explode(lit(ProbeTimes.toArray)).as("probe_ts"))
      RelOps.asofJoin(probes, ev, Seq("user_id"), "probe_ts", "sec", "value",
          direction = "forward", toleranceSeconds = 3600L)
        .withColumn("asof_value", round(col("asof_value"), 4))
    }),

    // Interval join: event counts/averages per maintenance window,
    // bucket-blocked equi-join (no nested-loop product).
    "q40_range_join" -> ((s, dir) => {
      import s.implicits._
      val iv = Windows.toDF("window_id", "w_start", "w_end")
      RelOps.overlapJoin(events(s, dir), iv, "sec", "w_start", "w_end", 86400L)
        .groupBy("window_id")
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
    }),

    // Gap-based sessionization (30-min gap) + per-session summary.
    "q41_sessionize" -> ((s, dir) =>
      RelOps.sessionize(events(s, dir), Seq("user_id"), "sec", 1800L, Seq("event_id"))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
        .withColumn("duration", col("end_sec") - col("start_sec"))),

    // Funnel: view → click → purchase within 1 h, earliest-chain
    // deterministic variant of ClickHouse windowFunnel — pure
    // conditional-MIN composition, no per-user event arrays.
    "q162_window_funnel" -> ((s, dir) =>
      RelOps.windowFunnel(events(s, dir), Seq("view", "click", "purchase"), 3600L)),

    // Weekly cohort retention triangle (the report behind ClickHouse's
    // retention()): first-active-week cohorts × week offsets.
    "q163_cohort_retention" -> ((s, dir) =>
      RelOps.cohortRetention(events(s, dir))),

    // Rolling 7-day active users: distinct-then-expand (bounded ×7
    // map-side fan-out), never a days×days self-join.
    "q164_rolling_active" -> ((s, dir) =>
      RelOps.rollingActive(events(s, dir))),

    // Funnel conversion report: entered / converted / rate + exact
    // p50/p90 time-to-convert over q162's earliest chains.
    "q170_funnel_report" -> ((s, dir) =>
      RelOps.funnelReport(events(s, dir), Seq("view", "click", "purchase"), 3600L)),

    // Robust per-type value outliers: median/MAD (insensitive to the
    // outliers being hunted, unlike mean/std).
    "q171_mad_outliers" -> ((s, dir) =>
      RelOps.madOutliers(events(s, dir))),

    // Matched conversion pairs: maximum disjoint view→purchase
    // matching per user via the closed-form prefix-deficit identity —
    // one shuffle, two longs of per-user state, no event arrays.
    "q205_matched_pairs" -> ((s, dir) =>
      RelOps.matchedPairs(events(s, dir), "view", "purchase")),

    // Event-sequence regex patterns (the ClickHouse sequenceMatch
    // general form): ordered-anywhere funnel, consecutive error burst,
    // signup-then-purchase — one user-keyed aggregate, no self-join.
    "q212_sequence_match" -> ((s, dir) =>
      RelOps.eventSeqPatterns(events(s, dir), Seq(
        "funnel_path" -> "v.*c.*p",
        "error_burst" -> "eee",
        "signup_purchase" -> "s.*p"))),

    // Time-weighted average value per user: holding-interval weights
    // (the irregular-sampling mean), integer 1e-4 value banking.
    "q218_time_weighted_avg" -> ((s, dir) =>
      RelOps.timeWeightedAvg(events(s, dir))),

    // CUSUM level-shift scan over per-type daily event counts:
    // banked deviations, exact prefix sums, earliest-tie peak.
    "q219_cusum_changepoint" -> ((s, dir) =>
      graft.ops.SeriesOps.cusumChangepoint(
        events(s, dir)
          .select(col("event_type").as("g"), (col("sec") / 86400L).cast("long").as("t"))
          .groupBy("g", "t").agg(count(lit(1)).as("n")))
        .withColumnRenamed("g", "event_type")),

    // First-order Markov transition matrix over user event streams:
    // consecutive-pair counts + row-normalized probabilities.
    "q220_transition_matrix" -> ((s, dir) =>
      RelOps.transitionMatrix(events(s, dir))),

    // Poisson point anomalies: each day's count vs its trailing 7-day
    // mean, z = (n−μ)/√μ — the spike detector beside q219's CUSUM.
    "q222_rate_anomalies" -> ((s, dir) =>
      graft.ops.SeriesOps.rateAnomalies(
        events(s, dir)
          .select(col("event_type").as("g"), (col("sec") / 86400L).cast("long").as("t"))
          .groupBy("g", "t").agg(count(lit(1)).as("n")))
        .withColumnRenamed("g", "event_type")),

    // Exponentially-decayed engagement score (half-life 7 days,
    // anchored at the corpus max timestamp): churn-scoring recency.
    "q221_decay_score" -> ((s, dir) =>
      RelOps.decayScore(events(s, dir))),

    // Bloom-prefiltered semi-join (runtime-filter shape): events of
    // heavy purchasers; result identical to the plain join (the
    // oracle IS the plain join — one-sided error proven per row).
    "q214_bloom_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val hot = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("np"))
        .filter(col("np") >= 15).select("user_id")
      RelOps.bloomSemiJoinCount(ev, hot)
    }),

    // RFM segmentation: per-user recency/frequency/monetary quintiles
    // (histogram competition ranks, never a global row_number) mapped
    // to the classic segment labels.
    "q196_rfm_segments" -> ((s, dir) =>
      RelOps.rfmSegments(events(s, dir))),

    // Hour-of-day seasonality per event type: 24-slot profile with a
    // chi-squared-against-uniform rhythm statistic.
    "q182_hourly_profile" -> ((s, dir) =>
      RelOps.hourlyProfile(events(s, dir))),

    // Most common within-session event-type trigrams: behavioral
    // n-grams over the q41 sessionization, take-ordered top 20.
    "q172_event_trigrams" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sess = RelOps.sessionize(events(s, dir), Seq("user_id"), "sec", 1800L, Seq("event_id"))
      val w = Window.partitionBy("user_id", "session_idx").orderBy("sec", "event_id")
      val counts = sess
        .select(col("event_type").as("t1"),
          lead("event_type", 1).over(w).as("t2"), lead("event_type", 2).over(w).as("t3"))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("trigram"))
        .groupBy("trigram").agg(count(lit(1)).as("n"))
      val rw = Window.orderBy(col("n").desc, col("trigram").asc)
      counts.withColumn("rank", row_number().over(rw)).filter(col("rank") <= 20)
    }),

    // Pivot: event_type → columns, avg value per user cohort. Explicit
    // value list keeps the plan a single pass (no discovery collect).
    "q42_pivot" -> ((s, dir) =>
      events(s, dir)
        .withColumn("cohort", (col("user_id") % 10).cast("int"))
        .groupBy("cohort")
        .pivot("event_type", EventTypes)
        .agg(round(avg(col("value")), 4))),

    // CUBE with grouping flags (superset of the reference's rollup).
    "q43_cube" -> ((s, dir) =>
      events(s, dir)
        .withColumn("cohort", (col("user_id") % 10).cast("int"))
        .cube(col("event_type"), col("cohort"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"),
          grouping(col("event_type")).cast("int").as("g_type"),
          grouping(col("cohort")).cast("int").as("g_cohort"))),

    // Exact interpolated percentiles per event type.
    "q44_percentiles" -> ((s, dir) =>
      events(s, dir)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.25)"), 4).as("p25"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"))),

    // Set operations INTERSECT/EXCEPT (absent in the reference's SQL
    // surface; standard engine capability): user-name sets of the first
    // vs second half of the range.
    "q47_setops" -> ((s, dir) => {
      val e = events(s, dir)
        .select(concat(col("event_type"), lit(".u"), col("user_id")).as("name"), col("sec"))
      val mid = 1705363200L // 2024-01-16
      val firstHalf = e.filter(col("sec") < mid).select("name").distinct()
      val secondHalf = e.filter(col("sec") >= mid).select("name").distinct()
      firstHalf.intersect(secondHalf).withColumn("tag", lit("both"))
        .unionByName(firstHalf.except(secondHalf).withColumn("tag", lit("first_only")))
    }),

    // Sketch aggregates per event type, ENGINE-PORTABLE: HLL distinct
    // users (256 seeded-md5 registers) + histogram-p50 estimate — the
    // q206/q237 sketch discipline applied to q48's original surface,
    // so the estimates themselves are oracle-verified bit-exactly.
    // The Spark-built-in approx_count_distinct/percentile_approx forms
    // (engine-specific HLL++/GK states) live on as the q48b bench-only
    // twin, gated against q94's exact values in SketchSpec.
    "q48_sketches" -> ((s, dir) => {
      val ev = events(s, dir)
      val hll = SketchOps.hllEstimate(SketchOps.hllRegisters(
          ev.select(col("event_type").as("g"), col("user_id").as("item")), 8, 11L), 8)
        .select(col("g"), round(col("est"), 4).as("est_users"))
      val p50 = SketchOps.histogramPercentiles(
          ev.select(col("event_type").as("g"), col("value").as("v")))
        .select(col("g"), col("n"), col("p50_est"))
      hll.join(p50, Seq("g"))
        .select(col("g").as("event_type"), col("n"), col("est_users"), col("p50_est"))
    }),

    // Exact twin of q48's sketch aggregates: count(DISTINCT) + exact
    // interpolated median, fully oracle-checkable — the driver-side
    // anchor the sketches themselves can't have (engine-specific
    // states). SketchSpec pins q48's approximations to THESE exact
    // values within tolerance, closing the loop: the oracle certifies
    // the exact side, the spec certifies approx ≈ exact.
    "q94_sketch_anchor" -> ((s, dir) =>
      events(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          round(expr("percentile(value, 0.5)"), 4).as("exact_p50"),
          count(lit(1)).as("n"))),

    // E1 — custom Aggregator (anyHeavy heavy-hitter, Boyer–Moore vote)
    // under the driver's oracle: the synthesized value column has a
    // strict (75%) majority per group, where the vote is guaranteed to
    // return the majority element — deterministic and equal to mode().
    "q46_anyheavy" -> ((s, dir) =>
      events(s, dir)
        .withColumn("v",
          when(col("event_id") % 4 < 3, lit(-1.0)).otherwise((col("user_id") % 7).cast("double")))
        .groupBy("event_type")
        .agg(graft.functions.AnyHeavy.anyHeavy(col("v")).as("heavy_value"),
          count(lit(1)).as("n"))),

    // A3 'last' dispatch through MetricQuery.rollup itself: value at max
    // version per bucket (deterministic, unlike 'any'/'first').
    "q52_rollup_last" -> ((s, dir) => {
      val pts = events(s, dir).select(
        concat(col("event_type"), lit(".u"), col("user_id")).as("metric"),
        col("value"), col("sec").cast("int").as("timestamp"),
        col("event_id").cast("int").as("updated"))
      MetricQuery.rollup(pts, "last", 86400)
        .withColumn("value", round(col("value"), 4))
    }),

    // Flagship /metricData path as a checked query: predicates → dedup →
    // rollup → gap fill → all-null padding, series stringified for
    // engine-portable comparison.
    "q45_metricdata_series" -> ((s, dir) => {
      val data = events(s, dir).select(
        concat(col("event_type"), lit(".u"), col("user_id")).as("metric"),
        col("value"),
        col("sec").cast("int").as("timestamp"),
        to_date(from_unixtime(col("sec"))).as("date"),
        col("event_id").cast("int").as("updated"))
      val params = QueryParams(1704844800, 1705708800, 21600)
      val metrics = (0 until 20).flatMap(u => Seq(s"click.u$u", s"error.u$u")) :+ "none.u999"
      MetricQuery.metricData(data, metrics, "avg", params)
        .select(col("metric"), col("start"), col("end"), col("step"),
          array_join(transform(col("points"),
            p => coalesce(round(p, 4).cast("string"), lit("null"))), ",").as("series"))
    })
  )

  private val windowValues =
    Windows.map { case (id, s, e) => s"($id, $s, $e)" }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q39_asof_join" ->
      s"""WITH ev AS (
         |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         |         arg_max(value, event_id) AS value
         |  FROM events GROUP BY 1, 2),
         |probes AS (SELECT DISTINCT user_id, unnest([${ProbeTimes.mkString(", ")}]) AS probe_ts
         |           FROM ev)
         |SELECT p.user_id, p.probe_ts, round(e.value, 4) AS asof_value
         |FROM probes p ASOF LEFT JOIN ev e
         |  ON p.user_id = e.user_id AND p.probe_ts >= e.sec""".stripMargin,

    "q60_asof_forward" ->
      s"""WITH ev AS (
         |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         |         arg_max(value, event_id) AS value
         |  FROM events GROUP BY 1, 2),
         |probes AS (SELECT DISTINCT user_id, unnest([${ProbeTimes.mkString(", ")}]) AS probe_ts
         |           FROM ev)
         |SELECT p.user_id, p.probe_ts,
         |  round(CASE WHEN e.sec IS NOT NULL AND e.sec - p.probe_ts <= 3600
         |        THEN e.value END, 4) AS asof_value
         |FROM probes p ASOF LEFT JOIN ev e
         |  ON p.user_id = e.user_id AND p.probe_ts <= e.sec""".stripMargin,

    "q162_window_funnel" ->
      s"""WITH $funnelCtes
         |SELECT m1.u AS user_id,
         |  CAST(CASE WHEN m3.m3 IS NOT NULL AND m3.m3 - m1.m1 <= 3600 THEN 3
         |            WHEN m2.m2 IS NOT NULL AND m2.m2 - m1.m1 <= 3600 THEN 2
         |            ELSE 1 END AS INTEGER) AS funnel_level
         |FROM m1 LEFT JOIN m2 ON m1.u = m2.u LEFT JOIN m3 ON m1.u = m3.u""".stripMargin,

    "q170_funnel_report" ->
      s"""WITH $funnelCtes,
         |conv AS (SELECT m3 - m1 AS tts FROM m3 WHERE m3 - m1 <= 3600),
         |en AS (SELECT count(*) AS n_entered FROM m1)
         |SELECT (SELECT n_entered FROM en) AS n_entered,
         |       CAST(count(*) AS BIGINT) AS n_converted,
         |       round(count(*) / CAST((SELECT n_entered FROM en) AS DOUBLE), 4) AS conversion_rate,
         |       round(quantile_cont(tts, 0.5), 4) AS p50_sec,
         |       round(quantile_cont(tts, 0.9), 4) AS p90_sec
         |FROM conv""".stripMargin,

    "q196_rfm_segments" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s, value FROM events),
        |u AS (SELECT user_id, max(s) AS lastv, count(*) AS n_events,
        |        sum(CAST(round(value * 100) AS BIGINT)) AS m2
        |      FROM e GROUP BY 1),
        |t AS (SELECT max(lastv) AS nowv, count(*) AS n FROM u),
        |b AS (SELECT user_id, (nowv - lastv) // 86400 AS days_since, n_events, m2, n
        |      FROM u CROSS JOIN t),
        |rr AS (SELECT v AS days_since,
        |         coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS rk
        |       FROM (SELECT days_since AS v, count(*) AS c FROM b GROUP BY 1)),
        |fr AS (SELECT v AS n_events,
        |         coalesce(sum(c) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS rk
        |       FROM (SELECT n_events AS v, count(*) AS c FROM b GROUP BY 1)),
        |mr AS (SELECT v AS m2,
        |         coalesce(sum(c) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS rk
        |       FROM (SELECT m2 AS v, count(*) AS c FROM b GROUP BY 1)),
        |j AS (SELECT b.user_id, b.days_since, b.n_events, b.m2,
        |        (5 * rr.rk - 1) // b.n + 1 AS r_q,
        |        (5 * fr.rk - 1) // b.n + 1 AS f_q,
        |        (5 * mr.rk - 1) // b.n + 1 AS m_q
        |      FROM b JOIN rr USING (days_since) JOIN fr USING (n_events) JOIN mr USING (m2))
        |SELECT user_id, days_since, n_events, round(m2 / 100.0, 2) AS monetary,
        |       CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
        |       CAST(m_q AS INTEGER) AS m_q,
        |       CASE WHEN r_q <= 2 AND f_q <= 2 AND m_q <= 2 THEN 'champion'
        |            WHEN r_q <= 2 AND f_q > 4 THEN 'new'
        |            WHEN r_q > 4 AND f_q > 4 THEN 'hibernating'
        |            WHEN r_q > 4 AND f_q <= 2 THEN 'at_risk'
        |            ELSE 'regular' END AS segment
        |FROM j""".stripMargin,

    "q171_mad_outliers" ->
      """WITH e AS (SELECT event_type AS g, value AS v FROM events WHERE value IS NOT NULL),
        |med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM e GROUP BY g),
        |dev AS (SELECT e.g, med, abs(v - med) AS dev FROM e JOIN med USING (g)),
        |mad AS (SELECT g, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY g)
        |SELECT dev.g AS event_type, count(*) AS n,
        |       round(min(med), 4) AS median, round(min(mad.mad), 4) AS mad,
        |       CAST(sum(CASE WHEN dev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (g) GROUP BY dev.g""".stripMargin,

    "q205_matched_pairs" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_b
        |          FROM events WHERE event_type IN ('view', 'purchase')),
        |p AS (SELECT user_id, is_b,
        |        sum(is_b) OVER w - sum(1 - is_b) OVER w AS deficit
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g AS (SELECT user_id, sum(1 - is_b) AS n_first, sum(is_b) AS n_second,
        |        max(deficit) AS md FROM p GROUP BY 1)
        |SELECT user_id, CAST(n_first AS BIGINT) AS n_first,
        |       CAST(n_second AS BIGINT) AS n_second,
        |       CAST(n_second - greatest(0, md) AS BIGINT) AS n_matched,
        |       CASE WHEN n_second > 0
        |            THEN round((n_second - greatest(0, md)) / CAST(n_second AS DOUBLE), 4)
        |       END AS match_rate
        |FROM g""".stripMargin,

    "q212_sequence_match" ->
      """WITH s AS (SELECT user_id,
        |            string_agg(substr(event_type, 1, 1), ''
        |              ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS seq
        |          FROM events GROUP BY 1)
        |SELECT user_id, CAST(length(seq) AS INTEGER) AS n_events,
        |       regexp_matches(seq, 'v.*c.*p') AS funnel_path,
        |       regexp_matches(seq, 'eee') AS error_burst,
        |       regexp_matches(seq, 's.*p') AS signup_purchase
        |FROM s""".stripMargin,

    "q214_bloom_join" ->
      """WITH hot AS (SELECT user_id FROM events WHERE event_type = 'purchase'
        |             GROUP BY 1 HAVING count(*) >= 15)
        |SELECT user_id, count(*) AS n_events
        |FROM events JOIN hot USING (user_id) GROUP BY 1""".stripMargin,

    "q218_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |            CAST(round(value * 10000) AS BIGINT) AS v4
        |          FROM events WHERE value IS NOT NULL),
        |iv AS (SELECT user_id, v4,
        |         lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) - sec AS dt
        |       FROM e),
        |g AS (SELECT user_id, sum(v4 * dt) AS num, sum(dt) AS span_sec
        |      FROM iv WHERE dt IS NOT NULL GROUP BY 1)
        |SELECT user_id, CAST(span_sec AS BIGINT) AS span_sec,
        |       round(num / CAST(span_sec AS DOUBLE) / 10000.0, 6) AS twa
        |FROM g WHERE span_sec > 0""".stripMargin,

    "q219_cusum_changepoint" ->
      """WITH d AS (SELECT event_type AS g, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS t,
        |            count(*) AS n
        |          FROM events GROUP BY 1, 2),
        |st AS (SELECT g, sum(n) AS tot, count(*) AS n_points FROM d GROUP BY 1),
        |c AS (SELECT d.g, t, CAST(round((n - tot / CAST(n_points AS DOUBLE)) * 1000000) AS BIGINT) AS c6,
        |        tot, n_points
        |      FROM d JOIN st ON st.g = d.g),
        |s AS (SELECT g, t, tot, n_points,
        |        sum(c6) OVER (PARTITION BY g ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s6
        |      FROM c),
        |p AS (SELECT g, tot, n_points, abs(s6) AS a, t,
        |        row_number() OVER (PARTITION BY g ORDER BY abs(s6) DESC, t ASC) AS r,
        |        max(abs(s6)) OVER (PARTITION BY g) AS maxabs
        |      FROM s)
        |SELECT g AS event_type, CAST(n_points AS BIGINT) AS n_points,
        |       CAST(tot AS BIGINT) AS total,
        |       round(tot / CAST(n_points AS DOUBLE), 4) AS mean,
        |       round(maxabs / 1000000.0, 4) AS max_abs_s, t AS cp_t,
        |       maxabs / 1000000.0 >= 0.05 * tot AS flagged
        |FROM p WHERE r = 1""".stripMargin,

    "q220_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |            CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |pr AS (SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS to_type
        |       FROM e),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM pr
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t2 AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |       round(n / CAST(tot AS DOUBLE), 4) AS prob
        |FROM c JOIN t2 USING (from_type)""".stripMargin,

    "q222_rate_anomalies" ->
      """WITH d AS (SELECT event_type AS g, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS t,
        |            count(*) AS n
        |          FROM events GROUP BY 1, 2),
        |s AS (SELECT g, t, n, sum(n) OVER w AS sumw, count(*) OVER w AS cntw
        |      FROM d WINDOW w AS (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT g, t, n, CAST(sumw AS DOUBLE) / cntw AS mu, cntw FROM s)
        |SELECT g AS event_type, t, CAST(n AS BIGINT) AS n,
        |       CASE WHEN cntw >= 3 THEN round(mu, 4) END AS mu,
        |       CASE WHEN cntw >= 3 AND mu > 0 THEN round((n - mu) / sqrt(mu), 4) END AS z,
        |       coalesce(abs(CASE WHEN cntw >= 3 AND mu > 0
        |                        THEN round((n - mu) / sqrt(mu), 4) END) >= 3.0, false) AS anomaly
        |FROM z""".stripMargin,

    "q221_decay_score" ->
      """WITH e AS (SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |          FROM events WHERE value IS NOT NULL),
        |a AS (SELECT max(sec) AS t FROM e),
        |c AS (SELECT user_id,
        |        CAST(round(pow(2.0, -CAST(t - sec AS DOUBLE) / 604800.0) * value * 1000000) AS BIGINT) AS c6
        |      FROM e CROSS JOIN a)
        |SELECT user_id, count(*) AS n_events, round(sum(c6) / 1000000.0, 4) AS score
        |FROM c GROUP BY 1""".stripMargin,

    "q182_hourly_profile" ->
      """WITH c AS (SELECT event_type AS t,
        |            CAST((CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600 AS INTEGER) AS h,
        |            count(*) AS n
        |          FROM events GROUP BY 1, 2),
        |ty AS (SELECT DISTINCT t FROM c),
        |grid AS (SELECT t, CAST(gg.g AS INTEGER) AS h FROM ty CROSS JOIN range(0, 24) gg(g)),
        |f AS (SELECT grid.t, grid.h, coalesce(n, 0) AS n FROM grid LEFT JOIN c USING (t, h)),
        |tot AS (SELECT t, sum(n) AS total FROM f GROUP BY t),
        |x AS (SELECT f.t, f.h, f.n, total,
        |        CAST(round(((n - total / 24.0) * (n - total / 24.0)) / (total / 24.0) * 1000000) AS BIGINT) AS c6
        |      FROM f JOIN tot USING (t)),
        |pk AS (SELECT t, h, n, row_number() OVER (PARTITION BY t ORDER BY n DESC, h) AS r FROM f),
        |ch AS (SELECT t, sum(c6) AS s6 FROM x GROUP BY t)
        |SELECT ch.t AS event_type, CAST(tot.total AS BIGINT) AS total,
        |       CAST(pk.h AS INTEGER) AS peak_hour,
        |       round(pk.n / CAST(tot.total AS DOUBLE), 4) AS peak_share,
        |       round(s6 / 1000000.0, 4) AS chi2_uniform
        |FROM ch JOIN tot USING (t)
        |  JOIN (SELECT t, h, n FROM pk WHERE r = 1) pk USING (t)""".stripMargin,

    "q172_event_trigrams" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |            CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |f AS (SELECT *, CASE WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (SELECT user_id, event_id, event_type, sec,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS si
        |      FROM f),
        |t AS (SELECT event_type || '>' || lead(event_type, 1) OVER w2
        |             || '>' || lead(event_type, 2) OVER w2 AS trigram,
        |        lead(event_type, 2) OVER w2 AS t3
        |      FROM s WINDOW w2 AS (PARTITION BY user_id, si ORDER BY sec, event_id)),
        |c AS (SELECT trigram, count(*) AS n FROM t WHERE t3 IS NOT NULL GROUP BY trigram)
        |SELECT trigram, n, CAST(r AS INTEGER) AS rank
        |FROM (SELECT *, row_number() OVER (ORDER BY n DESC, trigram) AS r FROM c)
        |WHERE r <= 20""".stripMargin,

    "q163_cohort_retention" ->
      """WITH act AS (SELECT DISTINCT user_id AS u,
        |               CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS w FROM events),
        |f AS (SELECT u, min(w) AS w0 FROM act GROUP BY u),
        |cells AS (SELECT w0, w - w0 AS off, count(*) AS n_active
        |          FROM act JOIN f USING (u) GROUP BY 1, 2),
        |sizes AS (SELECT w0, n_active AS cohort_n FROM cells WHERE off = 0)
        |SELECT cells.w0 AS cohort_week, off AS week_offset, n_active,
        |       round(n_active / CAST(cohort_n AS DOUBLE), 4) AS retention_rate
        |FROM cells JOIN sizes ON cells.w0 = sizes.w0""".stripMargin,

    "q164_rolling_active" ->
      """WITH act AS (SELECT DISTINCT user_id AS u,
        |               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d FROM events),
        |days AS (SELECT DISTINCT d FROM act),
        |ex AS (SELECT DISTINCT u, d + g AS rd FROM act CROSS JOIN range(0, 7) t(g))
        |SELECT rd AS day, count(*) AS active_users
        |FROM ex JOIN days ON days.d = ex.rd GROUP BY 1""".stripMargin,

    "q40_range_join" ->
      s"""WITH iv(window_id, w_start, w_end) AS (VALUES $windowValues),
         |e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events)
         |SELECT window_id, count(*) AS n, round(avg(value), 4) AS avg_value
         |FROM e JOIN iv ON e.sec >= iv.w_start AND e.sec < iv.w_end
         |GROUP BY window_id""".stripMargin,

    "q41_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |f AS (SELECT user_id, event_id, sec,
        |        CASE WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (SELECT user_id, sec,
        |        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_idx
        |      FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(sec) AS start_sec, max(sec) AS end_sec,
        |       max(sec) - min(sec) AS duration
        |FROM s GROUP BY user_id, session_idx""".stripMargin,

    "q42_pivot" -> {
      val cols = EventTypes.map(t =>
        s"round(avg(CASE WHEN event_type = '$t' THEN value END), 4) AS $t").mkString(",\n  ")
      s"""SELECT CAST(user_id % 10 AS INTEGER) AS cohort,
         |  $cols
         |FROM events GROUP BY 1""".stripMargin
    },

    "q43_cube" ->
      """SELECT event_type, CAST(user_id % 10 AS INTEGER) AS cohort,
        |       count(*) AS n, round(sum(value), 2) AS sum_value,
        |       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
        |       CAST(GROUPING(CAST(user_id % 10 AS INTEGER)) AS INTEGER) AS g_cohort
        |FROM events
        |GROUP BY CUBE(event_type, CAST(user_id % 10 AS INTEGER))""".stripMargin,

    "q44_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.25), 4) AS p25,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90
        |FROM events GROUP BY event_type""".stripMargin,

    "q47_setops" ->
      """WITH e AS (SELECT event_type || '.u' || CAST(user_id AS VARCHAR) AS name,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |f AS (SELECT DISTINCT name FROM e WHERE sec < 1705363200),
        |s AS (SELECT DISTINCT name FROM e WHERE sec >= 1705363200)
        |SELECT name, 'both' AS tag FROM (SELECT name FROM f INTERSECT SELECT name FROM s)
        |UNION ALL
        |SELECT name, 'first_only' AS tag FROM (SELECT name FROM f EXCEPT SELECT name FROM s)""".stripMargin,

    // The portable sketches replayed in SQL: the q206 HLL register
    // arithmetic (seeded-md5 hash, low-8-bit register, leading-zero
    // rank, integer 2^53-unit banking, alpha + small-range branch)
    // over user_id per event_type, joined to the q237 histogram-p50
    // cumulative — both estimates bit-exact across engines.
    "q48_sketches" ->
      """WITH h AS (SELECT event_type,
        |        CAST(concat('0x', substr(md5('11:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |      FROM events),
        |r AS (SELECT event_type, h & 255 AS reg,
        |        max(CASE WHEN h >> 8 = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END) AS mj
        |      FROM h GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*) AS n_regs,
        |        sum(CAST(pow(2, 53 - mj) AS BIGINT)) AS su FROM r GROUP BY 1),
        |e AS (SELECT event_type,
        |        (su + (256 - n_regs) * CAST(pow(2, 53) AS BIGINT)) / pow(2.0, 53) AS s,
        |        256 - n_regs AS zeros
        |      FROM a),
        |est AS (SELECT event_type,
        |          CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0) * 65536.0) / s <= 640.0 AND zeros > 0
        |               THEN 256.0 * ln(256.0 / zeros)
        |               ELSE (0.7213 / (1.0 + 1.079 / 256.0) * 65536.0) / s END AS e
        |        FROM e),
        |base AS (SELECT event_type, CAST(value AS DOUBLE) AS v
        |         FROM events WHERE value IS NOT NULL),
        |hh AS (SELECT event_type, CAST(floor(v * 100) AS BIGINT) AS b, count(*) AS c
        |       FROM base GROUP BY 1, 2),
        |t2 AS (SELECT event_type, sum(c) AS n FROM hh GROUP BY 1),
        |cu AS (SELECT hh.event_type, b, n,
        |         sum(c) OVER (PARTITION BY hh.event_type ORDER BY b
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |       FROM hh JOIN t2 USING (event_type)),
        |sk AS (SELECT event_type, n,
        |         round(min(CASE WHEN cum >= ceil(0.5 * n) THEN b END) / 100 + 0.005, 4) AS p50_est
        |       FROM cu GROUP BY 1, 2)
        |SELECT est.event_type, CAST(n AS BIGINT) AS n,
        |       round(e, 4) AS est_users, p50_est
        |FROM est JOIN sk USING (event_type)""".stripMargin,

    "q52_rollup_last" ->
      """WITH pts AS (
        |  SELECT event_type || '.u' || CAST(user_id AS VARCHAR) AS metric,
        |         value, CAST(CAST(floor(epoch(ts)) AS BIGINT) AS INTEGER) AS timestamp,
        |         CAST(event_id AS INTEGER) AS updated
        |  FROM events)
        |SELECT metric, CAST(timestamp - (timestamp % 86400) AS INTEGER) AS ts,
        |       round(arg_max(value, updated), 4) AS value
        |FROM pts GROUP BY 1, 2""".stripMargin,

    "q94_sketch_anchor" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       round(quantile_cont(value, 0.5), 4) AS exact_p50,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q46_anyheavy" ->
      """SELECT event_type,
        |       mode(CASE WHEN event_id % 4 < 3 THEN -1.0
        |                 ELSE CAST(user_id % 7 AS DOUBLE) END) AS heavy_value,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q45_metricdata_series" -> {
      val metricList = ((0 until 20).flatMap(u => Seq(s"'click.u$u'", s"'error.u$u'")) :+ "'none.u999'")
        .mkString(", ")
      s"""WITH pts AS (
         |  SELECT event_type || '.u' || CAST(user_id AS VARCHAR) AS metric,
         |         CAST(CAST(floor(epoch(ts)) AS BIGINT) AS INTEGER) AS sec,
         |         value, CAST(event_id AS INTEGER) AS updated
         |  FROM events),
         |req AS (SELECT unnest([$metricList]) AS metric),
         |dd AS (SELECT metric, sec, arg_max(value, updated) AS value
         |       FROM pts WHERE metric IN (SELECT metric FROM req)
         |         AND sec >= 1704844800 AND sec < 1705708800
         |       GROUP BY metric, sec),
         |r AS (SELECT metric, sec - (sec % 21600) AS ts, avg(value) AS v
         |      FROM dd GROUP BY 1, 2),
         |grid AS (SELECT metric, g AS ts
         |         FROM req CROSS JOIN range(1704844800, 1705708800, 21600) t(g)),
         |j AS (SELECT grid.metric, grid.ts, r.v FROM grid LEFT JOIN r USING (metric, ts))
         |SELECT metric, 1704844800 AS start, 1705708800 AS "end", 21600 AS step,
         |       string_agg(coalesce(CAST(round(v, 4) AS VARCHAR), 'null'), ',' ORDER BY ts) AS series
         |FROM j GROUP BY metric""".stripMargin
    }
  )
}
