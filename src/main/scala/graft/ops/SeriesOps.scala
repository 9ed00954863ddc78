package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graphite-web's function layer over rendered series, re-expressed as
  * per-series relational transforms (reference: the finder plugin hands
  * /metricData series to graphite-web, which applies functions like
  * summarize/derivative/timeShift client-side —
  * `/root/reference/src/main/pySources/graphouse.py:159-377` only
  * fetches; the function layer is the graphite render API).
  *
  * Frame contract: one row per (series key, bucket timestamp) with a
  * value column — what [[graft.query.MetricQuery.rollup]] emits. All
  * transforms are single-window or single-aggregation shapes: one
  * shuffle keyed by series, never a cross-series operation, so they
  * scale with the number of points per series partition.
  */
object SeriesOps {

  private def w(keyCol: String, tsCol: String) =
    Window.partitionBy(keyCol).orderBy(tsCol)

  /** Point-to-point difference per series (graphite `derivative`). */
  def derivative(df: DataFrame, keyCol: String = "metric", tsCol: String = "ts",
                 valCol: String = "v", outCol: String = "derivative"): DataFrame =
    df.withColumn(outCol, col(valCol) - lag(col(valCol), 1).over(w(keyCol, tsCol)))

  /** Derivative clamped to non-negative (counter resets → null),
    * graphite `nonNegativeDerivative`.
    */
  def nonNegativeDerivative(df: DataFrame, keyCol: String = "metric", tsCol: String = "ts",
                            valCol: String = "v", outCol: String = "nn_derivative"): DataFrame = {
    val delta = col(valCol) - lag(col(valCol), 1).over(w(keyCol, tsCol))
    df.withColumn(outCol, when(delta >= 0, delta))
  }

  /** Per-second rate: derivative / step (graphite `perSecond`). */
  def perSecond(df: DataFrame, stepSeconds: Long, keyCol: String = "metric",
                tsCol: String = "ts", valCol: String = "v", outCol: String = "per_second"): DataFrame = {
    val delta = col(valCol) - lag(col(valCol), 1).over(w(keyCol, tsCol))
    df.withColumn(outCol, delta / stepSeconds.toDouble)
  }

  /** Trailing moving average over `points` rows (graphite `movingAverage`). */
  def movingAverage(df: DataFrame, points: Int, keyCol: String = "metric",
                    tsCol: String = "ts", valCol: String = "v", outCol: String = "moving_avg"): DataFrame =
    df.withColumn(outCol,
      avg(col(valCol)).over(w(keyCol, tsCol).rowsBetween(-(points - 1), 0)))

  /** Forward-fill nulls with the last seen value per series (graphite
    * `keepLastValue`, unbounded variant).
    */
  def keepLastValue(df: DataFrame, keyCol: String = "metric", tsCol: String = "ts",
                    valCol: String = "v", outCol: String = "filled"): DataFrame =
    df.withColumn(outCol, last(col(valCol), ignoreNulls = true)
      .over(w(keyCol, tsCol).rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Re-bucket a series to a coarser step (graphite `summarize`):
    * buckets align to epoch 0 like the reference's rollup
    * (`intDiv(ts, step) * step`). `fn`: avg | sum | min | max | count.
    * One partial-aggregated pass.
    */
  def summarize(df: DataFrame, stepSeconds: Long, fn: String = "sum",
                keyCol: String = "metric", tsCol: String = "ts", valCol: String = "v"): DataFrame = {
    val agg: Column = fn match {
      case "avg"   => avg(col(valCol))
      case "sum"   => sum(col(valCol))
      case "min"   => min(col(valCol))
      case "max"   => max(col(valCol))
      case "count" => count(col(valCol)).cast("double")
      case other   => throw new IllegalArgumentException(s"summarize: unsupported fn '$other'")
    }
    df.groupBy(col(keyCol), (col(tsCol) - (col(tsCol) % stepSeconds)).cast("long").as(tsCol))
      .agg(agg.as(valCol))
  }

  /** Shift a series in time (graphite `timeShift`): pure projection —
    * rendering "this week vs last week" joins a shifted copy.
    */
  def timeShift(df: DataFrame, shiftSeconds: Long, tsCol: String = "ts"): DataFrame =
    df.withColumn(tsCol, (col(tsCol) + shiftSeconds).cast("long"))

  /** Running total per series (graphite `integral`). */
  def integral(df: DataFrame, keyCol: String = "metric", tsCol: String = "ts",
               valCol: String = "v", outCol: String = "integral"): DataFrame =
    df.withColumn(outCol, sum(col(valCol))
      .over(w(keyCol, tsCol).rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Pointwise transforms (graphite `scale` / `offset` / `absolute`). */
  def scale(v: Column, factor: Double): Column = v * factor
  def offset(v: Column, amount: Double): Column = v + amount
  def absolute(v: Column): Column = abs(v)

  /** Trailing moving median per series (graphite `movingMedian` —
    * robust smoothing that one outlier can't drag). The window's
    * values collect into a per-row array bounded by `points` (state is
    * the window, never the series), sorted, and interpolated with the
    * quantile_cont(0.5) formula — `median(...) OVER (ROWS k-1
    * PRECEDING)` in an oracle. Nulls are skipped (collect_list drops
    * them), matching SQL median and graphite None handling; an
    * all-null window yields null. The array is a window-output
    * ATTRIBUTE, so the median arithmetic referencing it 3× costs
    * nothing extra.
    */
  def movingMedian(df: DataFrame, points: Int, keyCol: String = "metric",
                   tsCol: String = "ts", valCol: String = "v",
                   outCol: String = "moving_median"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(-(points - 1), Window.currentRow)
    val staged = df.withColumn("__arr",
      sort_array(collect_list(col(valCol).cast("double")).over(w)))
    val n = size(col("__arr"))
    // `/` on columns is double division — cast the (exact) halves back
    // to int for element_at's 1-based index
    val half = ((n + 1) / 2).cast("int")
    val lo = (n / 2).cast("int")
    val med = when(n === 0, lit(null).cast("double"))
      .when(n % 2 === 1, element_at(col("__arr"), half))
      .otherwise((element_at(col("__arr"), lo) + element_at(col("__arr"), lo + 1)) / 2.0)
    staged.withColumn(outCol, med).drop("__arr")
  }

  /** Hit count (graphite `hitcount`): re-bucket a per-`stepSeconds` rate
    * series into `bucketSeconds` buckets of total hits — `sum(v) * step`
    * converts rate×time to a count. One partial-aggregated pass, same
    * epoch-aligned bucket arithmetic as [[summarize]].
    */
  def hitcount(df: DataFrame, bucketSeconds: Long, stepSeconds: Long,
               keyCol: String = "metric", tsCol: String = "ts", valCol: String = "v",
               outCol: String = "hits"): DataFrame =
    df.groupBy(col(keyCol), (col(tsCol) - (col(tsCol) % bucketSeconds)).cast("long").as(tsCol))
      .agg((sum(col(valCol)) * stepSeconds.toDouble).as(outCol))

  /** Exponentially-weighted moving average per series (graphite
    * `exponentialMovingAverage`): `s_1 = v_1`, `s_t = α·v_t + (1−α)·s_{t−1}`.
    *
    * The recursion is sequential per series by nature, so each series is
    * collapsed to one ts-sorted array (a single partial-agg shuffle keyed
    * by series), folded once with `aggregate`, and exploded back — state
    * is points-per-series, never cross-series, so this scales with the
    * longest series, not the table. Null values carry the state forward
    * unchanged and emit a null smoothed point (graphite skips Nones).
    *
    * `1−α` is computed once in driver double arithmetic; an oracle must
    * spell it `(1 - α)` so both engines fold bit-identical doubles.
    * Output: (key, ts, v, outCol).
    */
  def ewma(df: DataFrame, alpha: Double, keyCol: String = "metric", tsCol: String = "ts",
           valCol: String = "v", outCol: String = "ewma"): DataFrame = {
    val beta = 1.0 - alpha
    val outElem = "array<struct<ts:bigint,v:double,ewma:double>>"
    val pts = sort_array(collect_list(struct(
      col(tsCol).cast("long").as("ts"), col(valCol).cast("double").as("v"))))
    val folded = aggregate(
      col("pts"),
      struct(lit(null).cast("double").as("s"), array().cast(outElem).as("out")),
      (acc, p) => {
        val s = acc.getField("s")
        val v = p.getField("v")
        val sNew = when(v.isNull, s).when(s.isNull, v)
          .otherwise(lit(alpha) * v + lit(beta) * s)
        struct(
          sNew.as("s"),
          concat(acc.getField("out"), array(struct(
            p.getField("ts").as("ts"), v.as("v"),
            when(v.isNull, lit(null).cast("double")).otherwise(sNew).as("ewma")))).as("out"))
      },
      acc => acc.getField("out"))
    // explode_outer + null filter: a plain explode gets an inferred
    // pre-Generate filter with the whole interpreted fold inlined —
    // re-running the recursion per series (NOTES_r3 trap #7)
    df.groupBy(col(keyCol)).agg(pts.as("pts"))
      .select(col(keyCol), explode_outer(folded).as("pt"))
      .filter(col("pt").isNotNull)
      .select(col(keyCol), col("pt.ts").as(tsCol), col("pt.v").as(valCol),
        col("pt.ewma").as(outCol))
  }

  /** Holt linear (double-exponential) smoothing per series: level `s` and
    * trend `b`, `s_1 = v_1, b_1 = 0`; then `s_t = α·v_t + (1−α)(s+b)`,
    * `b_t = β(s_t − s_prev) + (1−β)·b` — the deseasonalized core of
    * graphite's `holtWintersForecast`. Same collapsed-series fold shape
    * as [[ewma]]; nulls carry state and emit null. Output: (key, ts, v,
    * level, trend) — the one-step forecast is `level + trend`.
    */
  def holtLinear(df: DataFrame, alpha: Double, betaP: Double,
                 keyCol: String = "metric", tsCol: String = "ts",
                 valCol: String = "v"): DataFrame = {
    val a1 = 1.0 - alpha
    val b1 = 1.0 - betaP
    val outElem = "array<struct<ts:bigint,v:double,level:double,trend:double>>"
    val pts = sort_array(collect_list(struct(
      col(tsCol).cast("long").as("ts"), col(valCol).cast("double").as("v"))))
    val folded = aggregate(
      col("pts"),
      struct(lit(null).cast("double").as("s"), lit(null).cast("double").as("b"),
        array().cast(outElem).as("out")),
      (acc, p) => {
        val s = acc.getField("s"); val b = acc.getField("b"); val v = p.getField("v")
        val sNew = when(v.isNull, s).when(s.isNull, v)
          .otherwise(lit(alpha) * v + lit(a1) * (s + b))
        val bNew = when(v.isNull, b).when(s.isNull, lit(0.0))
          .otherwise(lit(betaP) * (sNew - s) + lit(b1) * b)
        struct(
          sNew.as("s"), bNew.as("b"),
          concat(acc.getField("out"), array(struct(
            p.getField("ts").as("ts"), v.as("v"),
            when(v.isNull, lit(null).cast("double")).otherwise(sNew).as("level"),
            when(v.isNull, lit(null).cast("double")).otherwise(bNew).as("trend")))).as("out"))
      },
      acc => acc.getField("out"))
    df.groupBy(col(keyCol)).agg(pts.as("pts"))
      .select(col(keyCol), explode_outer(folded).as("pt"))
      .filter(col("pt").isNotNull)
      .select(col(keyCol), col("pt.ts").as(tsCol), col("pt.v").as(valCol),
        col("pt.level").as("level"), col("pt.trend").as("trend"))
  }

  /** Holt-Winters (triple-exponential) smoothing with ADDITIVE
    * seasonality per series — graphite's `holtWintersForecast` layer on
    * top of [[holtLinear]]'s deseasonalized core. State: level `s`,
    * trend `b`, and a `period`-slot seasonal vector `c` (zeros at
    * start); per point at 0-based position t with phase `p = t mod
    * period`:
    * {{{
    *   forecast_t = s + b + c[p]                      (pre-update state)
    *   s' = α(v_t − c[p]) + (1−α)(s + b)
    *   b' = β(s' − s) + (1−β)b
    *   c[p]' = γ(v_t − s') + (1−γ)c[p]
    * }}}
    * First point seeds `s = v, b = 0` (so `c[p]` stays 0 there). Nulls
    * carry all state, emit null, and still advance the phase (the slot
    * grid keeps its alignment). Same collapsed-series fold shape as
    * [[ewma]]/[[holtLinear]]: one partial-agg shuffle keyed by series,
    * state bounded by period + the series' own points — scales with the
    * longest series, not the table. Pass dyadic α/β/γ (0.25, 0.125, …)
    * when an oracle must replay the fold bit-identically: `1−p` is then
    * exact in binary on both engines. Output: (key, ts, v, level,
    * trend, seasonal, forecast).
    */
  def holtWinters(df: DataFrame, alpha: Double, betaP: Double, gamma: Double,
                  period: Int, keyCol: String = "metric", tsCol: String = "ts",
                  valCol: String = "v"): DataFrame = {
    require(period > 0, s"period must be positive, got $period")
    val a1 = 1.0 - alpha; val b1 = 1.0 - betaP; val g1 = 1.0 - gamma
    val nullD = lit(null).cast("double")
    val outElem =
      "array<struct<ts:bigint,v:double,level:double,trend:double,seasonal:double,forecast:double>>"
    val pts = sort_array(collect_list(struct(
      col(tsCol).cast("long").as("ts"), col(valCol).cast("double").as("v"))))
    val folded = aggregate(
      col("pts"),
      struct(nullD.as("s"), nullD.as("b"),
        array_repeat(lit(0.0), period).as("c"), array().cast(outElem).as("out")),
      (acc, p) => {
        val s = acc.getField("s"); val b = acc.getField("b"); val c = acc.getField("c")
        val v = p.getField("v")
        val phase = pmod(size(acc.getField("out")), lit(period)) // 0-based slot
        val cPrev = element_at(c, phase + 1)
        val forecast = when(v.isNull || s.isNull, nullD).otherwise(s + b + cPrev)
        val sNew = when(v.isNull, s).when(s.isNull, v)
          .otherwise(lit(alpha) * (v - cPrev) + lit(a1) * (s + b))
        val bNew = when(v.isNull, b).when(s.isNull, lit(0.0))
          .otherwise(lit(betaP) * (sNew - s) + lit(b1) * b)
        val cNew = lit(gamma) * (v - sNew) + lit(g1) * cPrev
        val cArr = when(v.isNull, c)
          .otherwise(transform(c, (x, i) => when(i === phase, cNew).otherwise(x)))
        struct(
          sNew.as("s"), bNew.as("b"), cArr.as("c"),
          concat(acc.getField("out"), array(struct(
            p.getField("ts").as("ts"), v.as("v"),
            when(v.isNull, nullD).otherwise(sNew).as("level"),
            when(v.isNull, nullD).otherwise(bNew).as("trend"),
            when(v.isNull, nullD).otherwise(cNew).as("seasonal"),
            forecast.as("forecast")))).as("out"))
      },
      acc => acc.getField("out"))
    df.groupBy(col(keyCol)).agg(pts.as("pts"))
      .select(col(keyCol), explode_outer(folded).as("pt"))
      .filter(col("pt").isNotNull)
      .select(col(keyCol), col("pt.ts").as(tsCol), col("pt.v").as(valCol),
        col("pt.level").as("level"), col("pt.trend").as("trend"),
        col("pt.seasonal").as("seasonal"), col("pt.forecast").as("forecast"))
  }

  /** Trailing moving mean/stddev and z-score anomaly flag per series
    * (graphite `stdev` + threshold alerting). The stddev is computed
    * from explicit windowed `n`/`Σv`/`Σv²` columns — the same formula an
    * oracle can spell out, rather than an engine-internal variance
    * kernel — staged as attributes so each window sum evaluates once.
    * z is null until the window holds ≥2 points or when sd = 0.
    */
  def anomalies(df: DataFrame, points: Int, zThreshold: Double,
                keyCol: String = "metric", tsCol: String = "ts",
                valCol: String = "v"): DataFrame = {
    val frame = w(keyCol, tsCol).rowsBetween(-(points - 1), 0)
    val staged = df
      .withColumn("_wn", count(col(valCol)).over(frame))
      .withColumn("_ws", sum(col(valCol)).over(frame))
      .withColumn("_wss", sum(col(valCol) * col(valCol)).over(frame))
    val mean = col("_ws") / col("_wn")
    val variance = (col("_wss") - col("_ws") * col("_ws") / col("_wn")) / (col("_wn") - 1)
    staged
      .withColumn("moving_mean", mean)
      .withColumn("moving_sd", when(col("_wn") > 1, sqrt(greatest(variance, lit(0.0)))))
      .withColumn("z", when(col("moving_sd") > 0,
        (col(valCol) - col("moving_mean")) / col("moving_sd")))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > zThreshold, lit(false)))
      .drop("_wn", "_ws", "_wss")
  }

  /** Aggregate series sharing selected name levels (graphite
    * `groupByNodes` / `sumSeries(groupByNode(...))`): the alias keeps
    * only the dot-levels at `nodes` (0-based), and all series mapping
    * to the same alias combine pointwise per timestamp. One
    * partial-aggregated pass keyed by (alias, ts).
    */
  def groupByNodes(df: DataFrame, nodes: Seq[Int], fn: String = "sum",
                   keyCol: String = "metric", tsCol: String = "ts",
                   valCol: String = "v"): DataFrame = {
    require(nodes.nonEmpty, "groupByNodes: need at least one node index")
    val parts = split(col(keyCol), "\\.")
    val alias = concat_ws(".", nodes.map(i => parts.getItem(i)): _*)
    df.groupBy(alias.as(keyCol), col(tsCol))
      .agg(statAgg(fn, col(valCol), col(tsCol)).as(valCol))
  }

  /** Each series as a percentage of the per-timestamp total across all
    * series (graphite `asPercent` with no reference series). One window
    * keyed by timestamp — the partition holds #series values, never a
    * whole series.
    */
  def asPercent(df: DataFrame, keyCol: String = "metric", tsCol: String = "ts",
                valCol: String = "v", outCol: String = "pct"): DataFrame =
    df.withColumn(outCol,
      col(valCol) / sum(col(valCol)).over(Window.partitionBy(col(tsCol))) * 100)

  private def statAgg(fn: String, v: Column, ts: Column): Column = fn match {
    case "max"     => max(v)
    case "min"     => min(v)
    case "avg"     => avg(v)
    case "sum"     => sum(v)
    case "current" => max_by(v, ts) // last reported point (graphite `current`)
    case other     => throw new IllegalArgumentException(s"seriesStat: unsupported fn '$other'")
  }

  /** One scalar stat per series — the base of graphite's series-filter
    * family (`highestMax`, `averageAbove`, `currentAbove`, …). One
    * partial-aggregated pass; output is #series rows, tiny next to the
    * point table.
    */
  def seriesStat(df: DataFrame, fn: String, keyCol: String = "metric",
                 tsCol: String = "ts", valCol: String = "v",
                 outCol: String = "stat"): DataFrame =
    df.groupBy(col(keyCol)).agg(statAgg(fn, col(valCol), col(tsCol)).as(outCol))

  /** Keep every row of the series whose stat passes the threshold
    * (graphite `averageAbove` / `currentAbove` / `maximumAbove`). The
    * surviving key set is broadcast back — the point table never
    * shuffles.
    */
  def filterSeries(df: DataFrame, fn: String, minStat: Double,
                   keyCol: String = "metric", tsCol: String = "ts",
                   valCol: String = "v"): DataFrame = {
    val keep = seriesStat(df, fn, keyCol, tsCol, valCol).filter(col("stat") >= minStat)
    df.join(broadcast(keep.select(keyCol)), Seq(keyCol), "left_semi")
  }

  /** Keep the k series ranked highest by stat (graphite `highestMax` /
    * `highestAverage`); ties break on key ascending for determinism.
    * orderBy+limit plans as TakeOrdered (no full-sort shuffle) and the
    * k keys broadcast back.
    */
  def topKSeries(df: DataFrame, fn: String, k: Int,
                 keyCol: String = "metric", tsCol: String = "ts",
                 valCol: String = "v"): DataFrame = {
    val top = seriesStat(df, fn, keyCol, tsCol, valCol)
      .orderBy(col("stat").desc, col(keyCol).asc).limit(k)
    df.join(broadcast(top.select(keyCol)), Seq(keyCol), "left_semi")
  }

  /** graphite `timeStack`: overlay the previous `nPeriods` periods of
    * each series onto the current time axis — shift `i` moves points
    * `i × periodSeconds` FORWARD so last week lines up over this week.
    * One scan with a small explode (not `nPeriods` unions): the period
    * index rides as a column, the caller filters to the render window.
    * Output: (key, shift_idx, ts, v) with ts already re-based.
    */
  def timeStack(df: DataFrame, periodSeconds: Long, nPeriods: Int,
                keyCol: String = "metric", tsCol: String = "ts",
                valCol: String = "v"): DataFrame = {
    require(nPeriods > 0, s"nPeriods must be positive: $nPeriods")
    df.select(col(keyCol), col(tsCol), col(valCol),
        explode(sequence(lit(0), lit(nPeriods - 1))).as("shift_idx"))
      .select(col(keyCol), col("shift_idx").cast("int").as("shift_idx"),
        (col(tsCol) + col("shift_idx") * periodSeconds).cast("long").as(tsCol),
        col(valCol))
  }

  /** Binary pointwise series combination (graphite `divideSeries` /
    * `diffSeries` / `multiplySeries` with two operands): join the two
    * frames on (key?, ts) and apply `op`. With `byKey = false` the
    * divisor is a single total series joined on ts alone (the common
    * "each series over the reference series" shape). Missing divisor
    * points yield null (graphite None), not dropped rows — a left
    * join, so the dividend grid survives intact.
    */
  def combineSeries(num: DataFrame, den: DataFrame, op: (Column, Column) => Column,
                    byKey: Boolean = false, keyCol: String = "metric",
                    tsCol: String = "ts", valCol: String = "v",
                    outCol: String = "combined"): DataFrame = {
    val joinCols = if (byKey) Seq(keyCol, tsCol) else Seq(tsCol)
    val d = den.select((joinCols.map(col) :+ col(valCol).as("__den")): _*)
    num.join(d, joinCols, "left")
      .withColumn(outCol, op(col(valCol), col("__den")))
      .drop("__den")
  }

  /** graphite `divideSeries`: pointwise ratio, null on a zero/missing
    * divisor.
    */
  def divideSeries(num: DataFrame, den: DataFrame, byKey: Boolean = false,
                   keyCol: String = "metric", tsCol: String = "ts",
                   valCol: String = "v", outCol: String = "ratio"): DataFrame =
    combineSeries(num, den,
      (a, b) => when(b =!= 0.0, a / b), byKey, keyCol, tsCol, valCol, outCol)

  /** Per-series least-squares line (graphite `linearRegression` /
    * trend detection). `x = (ts − x0) / xStep` keeps the normal
    * equations conditioned (epoch seconds squared would eat all the
    * mantissa); slope and intercept come from the closed-form sums
    * `(n·Σxv − Σx·Σv) / (n·Σx² − (Σx)²)` — plain sum aggregates both
    * engines spell identically, ONE partial-agg pass over the points.
    * A zero-variance x (single point / single bucket) yields null
    * slope and intercept rather than a division blow-up.
    * Output: (key, n_points, slope, intercept).
    */
  def linearTrend(df: DataFrame, x0: Long = 0L, xStep: Long = 1L,
                  keyCol: String = "metric", tsCol: String = "ts",
                  valCol: String = "v"): DataFrame = {
    val x = (col(tsCol).cast("double") - lit(x0.toDouble)) / lit(xStep.toDouble)
    val v = col(valCol).cast("double")
    val agg = df.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(x * x).as("sxx"),
      sum(v).as("sv"), sum(x * v).as("sxv"))
    val det = col("n") * col("sxx") - col("sx") * col("sx")
    agg
      .select(col(keyCol), col("n"), col("sx"), col("sv"),
        when(det =!= 0.0, (col("n") * col("sxv") - col("sx") * col("sv")) / det).as("slope"))
      .select(col(keyCol), col("n").cast("long").as("n_points"), col("slope"),
        ((col("sv") - col("slope") * col("sx")) / col("n")).as("intercept"))
  }

  /** graphite `removeAbovePercentile`: drop each series' points above
    * its own p-th percentile (exact interpolated percentile, ≡
    * `quantile_cont`). The per-series cutoff is one partial-agg pass
    * whose tiny result broadcasts back — the point table never
    * shuffles. The cutoff is rounded to 4dp BEFORE the comparison so
    * the keep/drop boundary is bit-identical across engines.
    * Output: the surviving points plus the series cutoff.
    */
  def removeAbovePercentile(df: DataFrame, p: Double, keyCol: String = "metric",
                            tsCol: String = "ts", valCol: String = "v"): DataFrame = {
    val cut = df.groupBy(col(keyCol))
      .agg(graft.ops.Rounding.round(expr(s"percentile($valCol, $p)"), 4).as("cutoff"))
    df.join(broadcast(cut), Seq(keyCol)).filter(col(valCol) <= col("cutoff"))
  }

  /** CUSUM changepoint scan per series: cumulative sum of deviations
    * from the series mean, the classic level-shift detector — a
    * regime change shows as a peak in |S|, located at the last point
    * of the old regime. Input is a counted series `(g, t, n)` (e.g.
    * per-type daily event counts); deviations bank as integer 1e-6
    * units so the prefix sums are exact, the peak location ties to
    * the EARLIEST t (struct-ordered arg-max, no second window), and a
    * series is flagged when the peak deviation mass reaches
    * `flagFrac` of its total count.
    *
    * Plan shape: one aggregate for (total, days), joined back
    * broadcast; ONE g-keyed window for the prefix sums; the arg-max
    * rollup shares the partitioning.
    *
    * Output: (g, n_points, total, mean 4dp, max_abs_s 4dp, cp_t,
    * flagged).
    */
  /** Poisson rate anomalies: each day's count against the trailing
    * 7 OBSERVED days' mean (current day excluded), z = (n − μ)/√μ —
    * the point-anomaly complement to [[cusumChangepoint]]'s level
    * shifts (a one-day spike barely moves CUSUM; a level shift barely
    * moves any single z). The frame is ROWS-based over the days the
    * series actually recorded: zero-count days are absent from a
    * groupBy-built `daily`, so across an activity gap the baseline
    * deliberately spans more than 7 calendar days (densify the grid
    * with a per-g calendar left-join first if calendar-time μ is
    * wanted). Days with fewer than `minPrior` prior observed days are
    * unscored (null z, never flagged). The window mean is sum/count
    * on exact longs — one g-keyed window, no second pass.
    *
    * Output: (g, t, n, mu 4dp, z 4dp, anomaly) — anomaly compares the
    * ROUNDED z to the threshold so both engines sit on the same side
    * of the boundary.
    */
  def rateAnomalies(daily: DataFrame, zThreshold: Double = 3.0,
                    minPrior: Int = 3): DataFrame = {
    val w = Window.partitionBy("g").orderBy("t").rowsBetween(-7, -1)
    val scored = daily
      .withColumn("__sumw", sum("n").over(w))
      .withColumn("__cntw", count(lit(1)).over(w))
      .withColumn("__mu", col("__sumw").cast("double") / col("__cntw"))
      .withColumn("__z", when(col("__cntw") >= minPrior && col("__mu") > 0,
        graft.ops.Rounding.round(
          (col("n") - col("__mu")) / sqrt(col("__mu")), 4)))
    scored.select(col("g"), col("t"), col("n"),
      when(col("__cntw") >= minPrior,
        graft.ops.Rounding.round(col("__mu"), 4)).as("mu"),
      col("__z").as("z"),
      coalesce(abs(col("__z")) >= zThreshold, lit(false)).as("anomaly"))
  }

  def cusumChangepoint(daily: DataFrame, flagFrac: Double = 0.05): DataFrame = {
    val stats = daily.groupBy("g")
      .agg(sum("n").as("__tot"), count(lit(1)).as("n_points"))
    val w = Window.partitionBy("g").orderBy("t")
    daily.join(broadcast(stats), Seq("g"))
      .withColumn("__c6", graft.ops.Rounding.round(
        (col("n") - col("__tot") / col("n_points").cast("double")) * 1e6).cast("long"))
      .withColumn("__s6", sum("__c6").over(w))
      .groupBy("g")
      .agg(min("n_points").as("n_points"), min("__tot").as("total"),
        max(abs(col("__s6"))).as("__maxabs"),
        max_by(col("t"), struct(abs(col("__s6")), -col("t"))).as("cp_t"))
      .select(col("g"), col("n_points"), col("total"),
        graft.ops.Rounding.round(col("total") / col("n_points").cast("double"), 4).as("mean"),
        graft.ops.Rounding.round(col("__maxabs") / 1e6, 4).as("max_abs_s"),
        col("cp_t"),
        (col("__maxabs") / 1e6 >= lit(flagFrac) * col("total")).as("flagged"))
  }
}
