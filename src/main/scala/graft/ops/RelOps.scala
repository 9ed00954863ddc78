package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's surface that a
  * full analytics engine needs: as-of join, interval (range) join and
  * gap-based sessionization. Each is implemented in the shape that
  * survives 100 TB — one shuffle keyed by the join/session key, no
  * non-equi join blowup, no global window.
  */
object RelOps {

  /** As-of join: for every probe row, the nearest right-side value at or
    * before (`direction = "backward"`, default) or at or after
    * (`"forward"`) the probe time within the same key group; null when
    * no such row (ASOF LEFT JOIN semantics). `toleranceSeconds >= 0`
    * additionally nulls matches farther than the tolerance (pandas
    * merge_asof's `tolerance`); negative means unlimited.
    *
    * Implementation: union probes and events, one window pass per key
    * ordered by (time, side) with `last`/`first (value) ignoreNulls`
    * carrying the nearest event value onto each probe. ONE shuffle on
    * the keys — no per-key cross product, no range-join explosion;
    * skewed keys are handled by AQE like any other window shuffle.
    * Events tied on the same timestamp must be pre-deduped (e.g. max_by
    * a version column) for deterministic output.
    *
    * `left` columns: keys :+ leftTimeCol. Output: keys, leftTimeCol,
    * asof_value.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTimeCol: String, rightTimeCol: String, valueCol: String,
               direction: String = "backward", toleranceSeconds: Long = -1L): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin direction must be backward|forward, got '$direction'")
    val probes = left.select(
      keys.map(col) ++ Seq(col(leftTimeCol).cast("long").as("__t"),
        lit(1).as("__probe"),
        lit(null).cast("struct<t:bigint,v:double>").as("__evt")): _*)
    val events = right
      // join-equality semantics: a NULL key never matches anything, but
      // Window.partitionBy groups nulls together — drop null-key events
      // so null-key probes fall through to asof_value = null
      .filter(keys.map(k => col(k).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(col(rightTimeCol).cast("long").as("__t"),
          lit(0).as("__probe"),
          // carry the whole event row (never null as a struct), not the
          // bare value: an event whose VALUE is null must still win the
          // as-of match and yield null — ASOF LEFT JOIN semantics —
          // rather than be skipped in favor of an older non-null value
          struct(col(rightTimeCol).cast("long").as("t"),
            col(valueCol).cast("double").as("v")).as("__evt")): _*)
    val part = Window.partitionBy(keys.map(col): _*)
    // Both directions run as a GROWING frame (unboundedPreceding →
    // currentRow): forward is backward over descending time. A literal
    // (currentRow → unboundedFollowing) frame would hit Spark's
    // UnboundedFollowingWindowFunctionFrame, which rebuilds the
    // aggregate buffer from scratch per row — O(rows²) per key — while
    // the growing frame folds incrementally. Ordering puts the event on
    // the probe's side of the frame at equal time → the match is
    // inclusive in both directions.
    val matched =
      if (direction == "backward")
        last(col("__evt"), ignoreNulls = true).over(
          part.orderBy(col("__t"), col("__probe"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        last(col("__evt"), ignoreNulls = true).over(
          part.orderBy(col("__t").desc, col("__probe"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val dist =
      if (direction == "backward") col("__t") - col("__m").getField("t")
      else col("__m").getField("t") - col("__t")
    val value =
      if (toleranceSeconds < 0) col("__m").getField("v")
      else when(dist <= toleranceSeconds, col("__m").getField("v"))
    probes.unionByName(events)
      .withColumn("__m", matched)
      .filter(col("__probe") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTimeCol),
        value.as("asof_value")): _*)
  }

  /** Interval (range) join: every (event, interval) pair with
    * `startCol <= timeCol < endCol`. Implemented with coarse-bucket
    * blocking: each interval explodes into the `bucketWidth`-wide
    * buckets it covers, events hash-join on their single bucket, and
    * the exact range predicate filters within the bucket — an equi-join
    * shuffle instead of a broadcast-nested-loop product, so it scales
    * to interval tables far beyond broadcast size. Each true pair
    * matches in exactly one bucket (the event's), so no dedup pass is
    * needed. Pick `bucketWidth` near the typical interval length:
    * intervals explode into O(length/width) rows while unrelated events
    * in the same bucket are filtered cheaply.
    *
    * Output: all event columns + all interval columns.
    */
  def overlapJoin(events: DataFrame, intervals: DataFrame, timeCol: String,
                  startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    val w = bucketWidth
    // x - x%w is a multiple of w, so the division is exact; cast back to
    // long because `/` is floating-point and sequence() needs integers
    def bucketOf(c: Column): Column =
      ((c.cast("long") - (c.cast("long") % w)) / w).cast("long")
    // empty/inverted intervals ([s,e) with e <= s) match nothing — drop
    // them BEFORE exploding: sequence(start, stop) defaults to step -1
    // when start > stop, so one corrupt row would otherwise explode into
    // millions of descending buckets
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - lit(1)))))
    val ev = events.withColumn("__bucket", bucketOf(col(timeCol)))
    ev.join(iv, Seq("__bucket"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bucket")
  }

  /** Gap-based sessionization: rows with the same `keys` belong to one
    * session while consecutive gaps stay <= `gapSeconds`. One window
    * pass partitioned by key: a new-session flag per row, a running sum
    * turning flags into session indexes. `orderCols` must make the
    * per-key order total (add a unique id to break time ties).
    *
    * Output: input columns + `session_idx` (0-based per key).
    */
  def sessionize(df: DataFrame, keys: Seq[String], timeCol: String,
                 gapSeconds: Long, orderCols: Seq[String]): DataFrame = {
    val order = (timeCol +: orderCols.filterNot(_ == timeCol)).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // two projections over the SAME window spec: Catalyst plans one
    // shuffle + one sort, the flag and its running sum evaluate in
    // consecutive Window operators without re-shuffling
    df.withColumn("__new",
        when(col(timeCol) - lag(col(timeCol), 1).over(w) > gapSeconds, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .drop("__new")
  }

  /** Skew-mitigating inner equi-join: spread the skewed (large) side's
    * rows over `saltFactor` shards of each key, replicate the other
    * side once per shard, and join on (keys, shard) — a hot key that
    * would flood one shuffle partition lands on `saltFactor` of them.
    * The manual form of AQE's skew-join splitting, for the plans AQE
    * won't rewrite (shuffle-hash joins, joins feeding a required
    * distribution) or for pre-emptive salting when the skew is known.
    *
    * The shard comes from a hash, not rand(). Pass `idCols` — columns
    * that distinguish rows WITHIN a key (a document id, a timestamp) —
    * to make the shard a pure function of row content: stable across
    * retries, replans, and input-layout changes, and transparent to the
    * optimizer (a deterministic projection pushes through). Without
    * `idCols` the shard falls back to hashing
    * `monotonically_increasing_id()`, which is uniform and
    * deterministic only for an UNCHANGED partition layout (a
    * repartition between uses re-deals the shards; correctness is
    * unaffected — the replicated side carries every shard — but
    * replays are not bit-stable) and, being nondeterministic to
    * Catalyst, blocks pushdowns through the salting projection.
    * Row-for-row equal to `skewed.join(other, keys)` either way (the
    * replicated side's shard column never survives).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8, idCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val missing = idCols.filterNot(skewed.columns.contains)
    require(missing.isEmpty,
      s"saltedJoin idCols not in left frame: ${missing.mkString(", ")}")
    val shard =
      if (idCols.nonEmpty)
        pmod(xxhash64((keys ++ idCols).map(col): _*), lit(saltFactor.toLong))
      else
        pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong))
    val s = skewed.withColumn("__shard", shard)
    val o = other.withColumn("__shard",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    s.join(o, keys :+ "__shard").drop("__shard")
  }

  /** Funnel analysis — the earliest-chain, deterministic variant of
    * ClickHouse's `windowFunnel(window)(ts, cond1, cond2, …)`
    * (graphouse's native engine family; cf. the reference's ClickHouse
    * backend): per user, the deepest step k reachable by the chain
    * `m_1 = min ts(step_1)`, `m_i = min ts(step_i) with ts > m_(i-1)`,
    * subject to `m_k − m_1 ≤ windowSeconds`. Earliest-chain (each step
    * takes its FIRST qualifying event) rather than ClickHouse's
    * sliding-restart search: the result is a pure composition of
    * conditional MIN aggregates — order-free, replayable in any engine,
    * and immune to per-user event-count blowup (no per-user event array
    * is ever materialized; a bot user with 10⁸ events costs the same
    * per-aggregate state as anyone else: one long per step).
    *
    * Plan shape: one filtered scan per step (steps.length total over
    * the checkpointed 3-column base), each a partial-aggregated MIN
    * keyed by user, chained by user-keyed joins — every shuffle is on
    * the same key, so AQE coalesces them into one exchange lineage.
    *
    * Output per user with ≥ 1 step-1 event: (<userCol>, funnel_level
    * ∈ [1, steps.length]). Levels beyond 1 require the step time within
    * the window of m_1.
    */
  def windowFunnel(events: DataFrame, steps: Seq[String], windowSeconds: Long,
                   userCol: String = "user_id", typeCol: String = "event_type",
                   secCol: String = "sec"): DataFrame = {
    val levels = funnelChains(events, steps, userCol, typeCol, secCol)
    // deepest level whose step time fits the window of m1
    val lvl = levels.zipWithIndex.map { case (df, i) =>
      df.filter(col("m") - col("m1") <= windowSeconds)
        .select(col("__u"), lit(i + 1).as("__lvl"))
    }.reduce(_ unionByName _)
    lvl.groupBy("__u").agg(max("__lvl").as("funnel_level"))
      .select(col("__u").as(userCol), col("funnel_level"))
  }

  /** The earliest-chain frames shared by [[windowFunnel]] and
    * [[funnelReport]]: element i is `(__u, m1, m)` for step i+1 —
    * window filtering stays with the caller. Each stage checkpoints
    * (read twice: its own consumer + the next stage's join).
    */
  private def funnelChains(events: DataFrame, steps: Seq[String], userCol: String,
                           typeCol: String, secCol: String): Seq[DataFrame] = {
    require(steps.size >= 2, s"windowFunnel needs >= 2 steps, got ${steps.size}")
    val base = events
      .filter(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol).as("__u"), col(typeCol).as("__t"), col(secCol).as("__s"))
      .localCheckpoint(true) // read once per step
    // m(i): (user, m1, mi) — the chain's entry time rides along so the
    // window check at the end needs no extra join back to m(1)
    var chain = base.filter(col("__t") === steps.head)
      .groupBy("__u").agg(min("__s").as("m1"))
      .withColumn("m", col("m1"))
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(chain.select(col("__u"), col("m1"), col("m")))
    for (step <- steps.tail) {
      chain = base.filter(col("__t") === step)
        .join(chain.select(col("__u"), col("m1"), col("m").as("__prev")), Seq("__u"))
        .filter(col("__s") > col("__prev"))
        .groupBy("__u", "m1").agg(min("__s").as("m"))
        .localCheckpoint(true)
      levels += chain.select(col("__u"), col("m1"), col("m"))
    }
    levels.toSeq
  }

  /** Funnel conversion report — the rollup a funnel exists to answer:
    * how many entered, how many fully converted inside the window, and
    * how long conversion takes (exact interpolated p50/p90 of
    * `m_last − m_1` over the converted users — the q44 percentile
    * convention, so the SQL replay matches bit-for-bit). One aggregate
    * over the (checkpointed) last chain frame; n_entered is a count of
    * the (checkpointed) first — nothing recomputes.
    *
    * Output: one row (n_entered, n_converted, conversion_rate,
    * p50_sec, p90_sec) — percentiles null when nobody converts.
    */
  def funnelReport(events: DataFrame, steps: Seq[String], windowSeconds: Long,
                   userCol: String = "user_id", typeCol: String = "event_type",
                   secCol: String = "sec"): DataFrame = {
    val chains = funnelChains(events, steps, userCol, typeCol, secCol)
    val entered = chains.head.agg(count(lit(1)).as("n_entered"))
    chains.last
      .filter(col("m") - col("m1") <= windowSeconds)
      .select((col("m") - col("m1")).as("__tts"))
      .agg(count(lit(1)).as("n_converted"),
        percentile(col("__tts"), lit(0.5)).as("__p50"),
        percentile(col("__tts"), lit(0.9)).as("__p90"))
      .crossJoin(broadcast(entered))
      .select(col("n_entered"), col("n_converted"),
        Rounding.round(col("n_converted") / col("n_entered").cast("double"), 4)
          .as("conversion_rate"),
        Rounding.round(col("__p50"), 4).as("p50_sec"),
        Rounding.round(col("__p90"), 4).as("p90_sec"))
  }

  /** Robust per-group outlier report via MAD (median absolute
    * deviation) — the value-column twin of the z-score detector that a
    * heavy-tailed metric needs: the median/MAD pair is insensitive to
    * the very outliers being hunted, where mean/std are dragged by
    * them. Flags `|v − median| > k·MAD` (k = 3 by default).
    *
    * Exact interpolated percentiles (the q44 convention — DuckDB
    * quantile_cont-equal), so the whole report replays in SQL; at
    * scales where exact per-group percentiles strain memory the same
    * shape runs on `approx_percentile` (documented escape, not the
    * audited default). Plan: median aggregate → broadcast back →
    * deviation frame (checkpointed; MAD aggregate + final rollup both
    * read it) → MAD aggregate → one rollup. All three aggregates key
    * on the group column.
    *
    * Output per group: (<groupCol>, n, median, mad, n_outliers) —
    * median/mad rounded 4dp; the flag compares UNROUNDED doubles,
    * identical expression both engines.
    */
  def madOutliers(df: DataFrame, valueCol: String = "value",
                  groupCol: String = "event_type", k: Double = 3.0): DataFrame = {
    val base = df.select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .localCheckpoint(true) // median agg + deviation join both read it
    val med = base.groupBy("__g").agg(percentile(col("__v"), lit(0.5)).as("__med"))
    val dev = base.join(broadcast(med), Seq("__g"))
      .withColumn("__dev", abs(col("__v") - col("__med")))
      .localCheckpoint(true) // MAD agg + the final rollup both read it
    val mad = dev.groupBy("__g").agg(percentile(col("__dev"), lit(0.5)).as("__mad"))
    dev.join(broadcast(mad), Seq("__g"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n"),
        Rounding.round(min("__med"), 4).as("median"),
        Rounding.round(min("__mad"), 4).as("mad"),
        sum(when(col("__dev") > lit(k) * col("__mad"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("__g").as(groupCol), col("n"), col("median"), col("mad"), col("n_outliers"))
  }

  /** Cohort retention triangle — the report behind ClickHouse's
    * `retention(cond1, cond2, …)` family, generalized to the standard
    * weekly cohort matrix: users are cohorted by their FIRST active
    * week (epoch-week = sec div 604800 — pure integer arithmetic, no
    * timezone), and each (cohort_week, week_offset) cell counts how
    * many of that cohort were active again `offset` weeks later.
    *
    * Plan shape: distinct (user, week) activity (one shuffle — the
    * dedup bounds every user's contribution to one row per week
    * regardless of event volume), min-week per user (user-keyed
    * partial agg), offset join on the same user key, then a
    * cohort-keyed rollup whose output is |weeks|² rows. Cohort sizes
    * are the offset-0 diagonal — derived from the rollup itself
    * (broadcast join), not a second scan.
    *
    * Output: (cohort_week, week_offset, n_active, retention_rate) with
    * the rate against the cohort's own size, rounded 4dp.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      secCol: String = "sec"): DataFrame = {
    val act = events
      .select(col(userCol).as("__u"), expr(s"$secCol div 604800").as("__w"))
      .distinct()
      .localCheckpoint(true) // first-week agg + offset join both read it
    val first = act.groupBy("__u").agg(min("__w").as("__w0"))
    val cells = act.join(first, Seq("__u"))
      .groupBy(col("__w0"), (col("__w") - col("__w0")).as("__off"))
      .agg(count(lit(1)).as("n_active"))
      .localCheckpoint(true) // |weeks|² rows; sizes + the rate join both read it
    val sizes = cells.filter(col("__off") === 0)
      .select(col("__w0"), col("n_active").as("__cohort_n"))
    cells.join(broadcast(sizes), Seq("__w0"))
      .select(col("__w0").as("cohort_week"), col("__off").as("week_offset"),
        col("n_active"),
        Rounding.round(col("n_active") / col("__cohort_n").cast("double"), 4)
          .as("retention_rate"))
  }

  /** Hour-of-day seasonality profile per event type: the 24-slot
    * activity histogram with a χ²-against-uniform statistic — near
    * zero means the type fires round-the-clock (machine traffic),
    * large means a strong daily rhythm (human traffic). Hours are
    * pure integer arithmetic on epoch seconds (UTC — no timezone
    * dependency); empty hours join in from a broadcast 24-row grid so
    * they contribute their full (0−e)²/e term; χ² terms bank as
    * integer micro-units. One count aggregate + a |types|×24 rollup.
    *
    * Output per type: (event_type, total, peak_hour, peak_share,
    * chi2_uniform) — ties on the peak break to the earliest hour.
    */
  def hourlyProfile(events: DataFrame, typeCol: String = "event_type",
                    secCol: String = "sec"): DataFrame = {
    val counts = events
      .groupBy(col(typeCol).as("__t"),
        expr(s"($secCol % 86400) div 3600").cast("int").as("__h"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // the type list + the grid join both read it
    val grid = counts.select("__t").distinct()
      .select(col("__t"), explode(sequence(lit(0), lit(23))).as("__h"))
    val full = grid.join(counts, Seq("__t", "__h"), "left")
      .select(col("__t"), col("__h"), coalesce(col("__n"), lit(0L)).as("__n"))
      .localCheckpoint(true) // totals + the chi2 pass both read it
    val totals = full.groupBy("__t").agg(sum("__n").as("total"))
    full.join(broadcast(totals), Seq("__t"))
      .select(col("__t"), col("__h"), col("__n"), col("total"),
        Rounding.round(
          ((col("__n") - col("total") / 24.0) * (col("__n") - col("total") / 24.0))
            / (col("total") / 24.0) * 1e6).cast("long").as("__c6"))
      .groupBy(col("__t"), col("total"))
      .agg(max(struct(col("__n").as("n"), (-col("__h")).as("negh"))).as("__pk"),
        sum("__c6").as("__s6"))
      .select(col("__t").as(typeCol), col("total"),
        (-col("__pk.negh")).cast("int").as("peak_hour"),
        Rounding.round(col("__pk.n") / col("total").cast("double"), 4).as("peak_share"),
        Rounding.round(col("__s6") / 1e6, 4).as("chi2_uniform"))
  }

  /** Rolling N-day active users (the WAU/MAU report): for every day
    * present in the data, how many distinct users were active in the
    * trailing `windowDays` window ending that day.
    *
    * Plan shape: distinct (user, day) FIRST (epoch-day integer
    * arithmetic; the dedup caps any user's contribution at one row per
    * day), then each activity row expands map-side into the ≤
    * `windowDays` report days it feeds — a bounded ×N fan-out, not a
    * self-join of days×days — re-dedups per (user, report day), and
    * rolls up. Report days are clamped to days that actually occur
    * (broadcast of the distinct-day table: decades of daily grain stay
    * in the kilobytes). No window function, no per-day scan — the
    * whole report is two dedup shuffles and a count.
    */
  def rollingActive(events: DataFrame, windowDays: Int = 7,
                    userCol: String = "user_id", secCol: String = "sec"): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val act = events
      .select(col(userCol).as("__u"), expr(s"$secCol div 86400").as("__d"))
      .distinct()
      .localCheckpoint(true) // day table + the expansion both read it
    val days = act.select(col("__d").as("__rd")).distinct()
    act
      .select(col("__u"),
        explode(sequence(col("__d"), col("__d") + (windowDays - 1))).as("__rd"))
      .distinct()
      .join(broadcast(days), Seq("__rd"))
      .groupBy("__rd").agg(count(lit(1)).as("active_users"))
      .select(col("__rd").as("day"), col("active_users"))
  }

  /** RFM segmentation — the ClickHouse-family behavioral rollup: per
    * user, Recency (days since last event, anchored to the corpus max
    * so the report replays identically), Frequency (event count) and
    * Monetary (value sum, banked to exact cents so the sum is
    * order-free), each scored into `quantiles` buckets, then mapped to
    * the classic segment labels (champion / new / at_risk /
    * hibernating / regular).
    *
    * Plan shape: ONE hash aggregate to per-user rows (checkpointed —
    * three signal histograms plus the final join all read it); bucket
    * ranks come from VALUE-HISTOGRAM cumsums (the q150 discipline —
    * days/counts/cents aggregate to bounded bins, never a global
    * row_number over users), joined back broadcast. Quantile index is
    * exact integer arithmetic: q_idx = (q·rank − 1) div n + 1 with
    * COMPETITION ranks, so ties share a bucket deterministically.
    *
    * Output: (<userCol>, days_since, n_events, monetary, r_q, f_q,
    * m_q, segment); r_q/f_q/m_q = 1 is best (most recent / most
    * frequent / highest spend).
    */
  def rfmSegments(events: DataFrame, userCol: String = "user_id", secCol: String = "sec",
                  valueCol: String = "value", quantiles: Int = 5): DataFrame = {
    require(quantiles >= 2, s"quantiles must be >= 2, got $quantiles")
    val peru = events.groupBy(col(userCol))
      .agg(max(col(secCol)).as("__last"), count(lit(1)).as("n_events"),
        sum(Rounding.round(col(valueCol) * 100).cast("long")).as("__m2"))
      .localCheckpoint(true) // three signal histograms + the final join all read it
    val tot = peru.agg(max("__last").as("__now"), count(lit(1)).as("__n"))
    def intDiv(c: Column, d: Column): Column = ((c - pmod(c, d)) / d).cast("long")
    val base = peru.crossJoin(broadcast(tot))
      .select(col(userCol),
        intDiv(col("__now") - col("__last"), lit(86400L)).as("days_since"),
        col("n_events"), col("__m2"), col("__n"))
    // competition rank per signal from a bounded value histogram
    def rankTable(sig: Column, name: String, asc: Boolean): DataFrame = {
      val hist = base.groupBy(sig.as("__v")).agg(count(lit(1)).as("__c"))
      val w = Window.orderBy(if (asc) col("__v").asc else col("__v").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      hist.select(col("__v").as(name), (coalesce(sum("__c").over(w), lit(0L)) + 1L).as(s"__rk_$name"))
    }
    def q(rank: Column): Column =
      (intDiv(lit(quantiles.toLong) * rank - 1L, col("__n")) + 1L).cast("int")
    val ranked = base
      .join(broadcast(rankTable(col("days_since"), "days_since", asc = true)), Seq("days_since"))
      .join(broadcast(rankTable(col("n_events"), "n_events", asc = false)), Seq("n_events"))
      .join(broadcast(rankTable(col("__m2"), "__m2", asc = false)), Seq("__m2"))
      .select(col(userCol), col("days_since"), col("n_events"),
        Rounding.round(col("__m2") / 100.0, 2).as("monetary"),
        q(col("__rk_days_since")).as("r_q"), q(col("__rk_n_events")).as("f_q"),
        q(col("__rk___m2")).as("m_q"))
    val lo = lit(2); val hi = lit(quantiles - 1)
    ranked.withColumn("segment",
      when(col("r_q") <= lo && col("f_q") <= lo && col("m_q") <= lo, "champion")
        .when(col("r_q") <= lo && col("f_q") > hi, "new")
        .when(col("r_q") > hi && col("f_q") > hi, "hibernating")
        .when(col("r_q") > hi && col("f_q") <= lo, "at_risk")
        .otherwise("regular"))
  }

  /** Matched conversion pairs: per user, the MAXIMUM number of disjoint
    * (`first` event → later `second` event) pairs, each event consumed
    * at most once — the "how many purchases can be attributed to a
    * distinct prior view" measure. ClickHouse's sequenceCount answers
    * the greedy-scan variant with a stateful automaton; the maximum
    * matching has a closed form that needs NO per-user event array:
    *
    *   matched = n_second - max(0, max over time-ordered prefixes of
    *                               (cum_second - cum_first))
    *
    * (Hall-style argument: a second-event goes unmatched exactly when
    * some prefix holds more seconds than firsts; the worst prefix
    * deficit is the total unmatched count. Ties order by (sec,
    * event_id) so both engines scan identically.)
    *
    * Plan shape: ONE shuffle on the user key — the running sums, the
    * prefix-max and the final per-user aggregate all share the same
    * partitioning, so Catalyst plans a single Exchange; per-user state
    * is two longs, never a collected sequence.
    *
    * Output: (user, n_first, n_second, n_matched, match_rate) for
    * users with at least one of either event.
    */
  /** Time-weighted average value per user: each observation holds its
    * value until the next one, so the mean weights by holding interval
    * (the irregular-sampling mean ClickHouse serves as avgWeighted
    * over deltas) — the honest summary when events arrive unevenly,
    * where the plain mean over-counts bursts. The last observation has
    * no forward interval and is excluded; single-event users drop
    * (zero span).
    *
    * Determinism: values bank as integer 1e-4 units before the
    * interval product, so the aggregate is exact-integer and
    * order-free. ONE user-keyed shuffle (lead window + aggregate share
    * the partitioning).
    *
    * Output: (user, span_sec, twa 6dp).
    */
  def timeWeightedAvg(events: DataFrame, userCol: String = "user_id",
                      secCol: String = "sec", valueCol: String = "value",
                      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(secCol), col(tieCol))
    events.filter(col(valueCol).isNotNull)
      .select(col(userCol), col(secCol), col(tieCol),
        Rounding.round(col(valueCol) * 1e4).cast("long").as("__v4"))
      .withColumn("__next", lead(col(secCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(col(userCol), (col("__next") - col(secCol)).as("__dt"), col("__v4"))
      .groupBy(userCol)
      .agg(sum(col("__v4") * col("__dt")).as("__num"), sum("__dt").as("span_sec"))
      .filter(col("span_sec") > 0)
      .select(col(userCol), col("span_sec"),
        Rounding.round(col("__num") / col("span_sec").cast("double") / 1e4, 6).as("twa"))
  }

  /** First-order Markov transition matrix over each user's event
    * stream: counts and row-normalized probabilities of consecutive
    * (from → to) type pairs — the behavioral flow map (Sankey edges)
    * behind "what do users do after an error". Pairs form map-side
    * from ONE lead window (user-keyed shuffle); the matrix itself is
    * |types|² rows, and the row totals join back broadcast.
    *
    * Output: (from_type, to_type, n, prob 4dp).
    */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       secCol: String = "sec", tieCol: String = "event_id",
                       typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(secCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(secCol), col(tieCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead("from_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("__tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        Rounding.round(col("n") / col("__tot").cast("double"), 4).as("prob"))
  }

  /** Exponentially-decayed engagement score per user: Σ value ·
    * 2^(−age/halfLife), ages anchored at the corpus max timestamp —
    * the recency-weighted activity measure behind churn scoring.
    * Per-event decayed contributions bank as integer 1e-6 units (the
    * transcendental evaluates once per event, then the aggregate is
    * exact and order-free); the anchor rides as a broadcast scalar.
    *
    * Output: (user, n_events, score 4dp).
    */
  def decayScore(events: DataFrame, halfLifeSec: Long = 604800L,
                 userCol: String = "user_id", secCol: String = "sec",
                 valueCol: String = "value"): DataFrame = {
    val e = events.filter(col(valueCol).isNotNull)
    val anchor = broadcast(e.agg(max(col(secCol)).as("__t")))
    e.crossJoin(anchor)
      .select(col(userCol),
        Rounding.round(pow(lit(2.0),
          -(col("__t") - col(secCol)).cast("double") / lit(halfLifeSec.toDouble))
          * col(valueCol) * 1e6).cast("long").as("__c6"))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_events"),
        Rounding.round(sum("__c6") / 1e6, 4).as("score"))
  }

  /** Event-sequence pattern match: per user, the time-ordered initial
    * letters of its event types concatenated into one string, matched
    * against regex patterns — the general form behind ClickHouse's
    * `sequenceMatch('(?1).*(?2)')`: adjacency (`'ee'`), ordered-anywhere
    * (`'v.*c.*p'`), negation (`'v[^p]*$'`) all express directly as
    * regex over the sequence string.
    *
    * This is the ONE behavioral operator whose semantics genuinely
    * require the per-user sequence to materialize (ClickHouse holds
    * the same per-user state); it is bounded by per-user activity, not
    * corpus size, and builds in a single user-keyed aggregate
    * (collect → array_sort → transform — no window, no self-join).
    * Ties order by (sec, tie) so both engines scan identically.
    *
    * Output: (user, n_events, <one boolean column per pattern>).
    */
  def eventSeqPatterns(events: DataFrame, patterns: Seq[(String, String)],
                       userCol: String = "user_id", secCol: String = "sec",
                       tieCol: String = "event_id",
                       typeCol: String = "event_type"): DataFrame = {
    val seq = events
      .select(col(userCol),
        struct(col(secCol).as("s"), col(tieCol).as("t"),
          substring(col(typeCol), 1, 1).as("c")).as("__e"))
      .groupBy(userCol)
      .agg(concat_ws("",
        transform(array_sort(collect_list(col("__e"))), e => e.getField("c"))).as("__seq"))
    patterns.foldLeft(
        seq.withColumn("n_events", length(col("__seq")).cast("int"))) {
        case (df, (name, re)) => df.withColumn(name, col("__seq").rlike(re))
      }
      .drop("__seq")
  }

  /** Bloom-prefiltered semi-join aggregate: the runtime-filter pattern
    * for `big facts ⋈ small key set` when the key set is too large to
    * broadcast as an exact hash table but fits as a Bloom filter
    * (~1.2 bytes/key at 1% fpp — a billion keys in ~1.2 GB). The
    * probe side drops non-members MAP-SIDE before any shuffle; the
    * exact join then removes the ≤fpp false positives, so the result
    * is IDENTICAL to the plain join (one-sided error: no false
    * negatives) while the shuffle carries only the ~selectivity
    * fraction of the fact table. At these test sizes the exact join
    * alone would do; the operator exists for the shape.
    *
    * The filter is keyed on [[SampleOps.seededHash]] of the key's
    * string form, NOT a numeric cast — so any key type works (a UUID
    * string under cast("long") nulls out and silently drops every
    * row); hash collisions are just extra false positives the exact
    * join removes. NOTE: building the filter is EAGER — sizing it
    * takes a count of the distinct key set, so calling this runs two
    * key-side jobs (count + filter build) before the returned frame
    * is ever acted on.
    *
    * Output: (key, n_events) per surviving key.
    */
  def bloomSemiJoinCount(facts: DataFrame, keys: DataFrame,
                         keyCol: String = "user_id",
                         fpp: Double = 0.01): DataFrame = {
    val spark = facts.sparkSession
    val bloomSeed = 0xB100FL
    val k = keys.select(col(keyCol)).distinct()
    val kh = k.select(SampleOps.seededHash(col(keyCol), bloomSeed).as("__h"))
    val bf = kh.stat.bloomFilter("__h", math.max(k.count(), 1L), fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf((x: Long) => bc.value.mightContainLong(x))
    facts
      .filter(might(SampleOps.seededHash(col(keyCol), bloomSeed))) // map-side runtime filter
      .join(broadcast(k), Seq(keyCol)) // exact, on the ORIGINAL key values
      .groupBy(keyCol).agg(count(lit(1)).as("n_events"))
  }

  def matchedPairs(events: DataFrame, first: String, second: String,
                   userCol: String = "user_id", secCol: String = "sec",
                   tieCol: String = "event_id",
                   typeCol: String = "event_type"): DataFrame = {
    val e = events.filter(col(typeCol).isin(first, second))
      .select(col(userCol), col(secCol), col(tieCol),
        when(col(typeCol) === second, 1L).otherwise(0L).as("__is_b"))
    val w = Window.partitionBy(userCol).orderBy(col(secCol), col(tieCol))
    e.withColumn("__deficit",
        sum(col("__is_b")).over(w) - sum(lit(1L) - col("__is_b")).over(w))
      .groupBy(userCol)
      .agg(sum(lit(1L) - col("__is_b")).as("n_first"),
        sum("__is_b").as("n_second"),
        max("__deficit").as("__md"))
      .select(col(userCol), col("n_first"), col("n_second"),
        (col("n_second") - greatest(lit(0L), col("__md"))).as("n_matched"))
      .withColumn("match_rate",
        when(col("n_second") > 0,
          Rounding.round(col("n_matched") / col("n_second").cast("double"), 4)))
  }
}
