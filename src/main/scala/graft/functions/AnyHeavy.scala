package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Heavy-hitter aggregate — the engine hook for ClickHouse aggregate
  * names outside Spark's built-ins (SURVEY §2.10 E1: the reference
  * string-splices ANY CH aggregate name into its rollup SQL, so e.g.
  * `anyHeavy` is legal in a retention config). Implements the
  * Boyer–Moore majority vote: returns a value that is a strict majority
  * of the group if one exists; otherwise some frequent-ish value — the
  * same approximate contract as ClickHouse's `anyHeavy`.
  *
  * Distributed shape: constant-size buffer (candidate, weight), merge is
  * the classic weighted vote — associative enough for partial
  * aggregation; like the original, the result is only guaranteed when a
  * true majority exists.
  */
final case class HeavyState(var candidate: Double, var weight: Long, var nonEmpty: Boolean)

final class AnyHeavyAggregator extends Aggregator[Double, HeavyState, Double] {
  override def zero: HeavyState = HeavyState(0.0, 0L, nonEmpty = false)

  override def reduce(b: HeavyState, v: Double): HeavyState = {
    b.nonEmpty = true
    if (b.weight == 0) { b.candidate = v; b.weight = 1 }
    else if (b.candidate == v) b.weight += 1
    else b.weight -= 1
    b
  }

  override def merge(a: HeavyState, b: HeavyState): HeavyState = {
    if (!b.nonEmpty) return a
    if (!a.nonEmpty) return b
    if (a.candidate == b.candidate) { a.weight += b.weight; a }
    else if (a.weight >= b.weight) { a.weight -= b.weight; a }
    else { b.weight -= a.weight; b }
  }

  // groups always have >= 1 row under groupBy, so finish sees nonEmpty
  override def finish(r: HeavyState): Double = r.candidate

  override def bufferEncoder: Encoder[HeavyState] = Encoders.product[HeavyState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object AnyHeavy {
  private lazy val fn = udaf(new AnyHeavyAggregator)
  def anyHeavy(value: Column): Column = fn(value)
}
