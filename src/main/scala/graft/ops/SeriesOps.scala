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
}
