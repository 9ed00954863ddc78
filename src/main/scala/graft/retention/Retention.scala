package graft.retention

import scala.util.matching.Regex

/** Resolved retention for one metric: the rollup aggregation function name
  * and an age→step RangeMap (reference `retention/MetricRetention.java:18-47`):
  * ranges (ageSeconds ascending) partition [0, ∞) — step of range i applies
  * for ages in [age_i, age_{i+1}).
  */
final case class MetricRetention(function: String, ranges: Seq[(Int, Int)]) {
  require(ranges.nonEmpty, "retention needs at least one (age, step) range")
  private val sorted = ranges.sortBy(_._1)
  require(sorted.head._1 == 0, s"first retention range must start at age 0, got $sorted")

  /** Step for a data age in seconds (negative ages clamp to 0,
    * reference MetricRetention.java:41-47).
    */
  def stepFor(ageSeconds: Int): Int = {
    val age = math.max(ageSeconds, 0)
    var step = sorted.head._2
    var i = 1
    while (i < sorted.length && sorted(i)._1 <= age) { step = sorted(i)._2; i += 1 }
    step
  }
}

/** One configured rule. Partial rules are legal: `function == ""` means
  * retention-only, `ranges.isEmpty` means aggregation-only
  * (reference `retention/MetricRetentionConfig.java:7-63`).
  */
final case class RetentionRule(
    regexp: String,
    isDefault: Boolean,
    function: String,
    ranges: Seq[(Int, Int)]
) {
  lazy val compiled: Regex = regexp.r
  def matches(name: String): Boolean = isDefault || compiled.findFirstIn(name).isDefined
}

/** First-regex-match resolution with partial-rule combination
  * (reference `BaseRetentionProvider.java:16-24` +
  * `CombinedRetentionProvider.java:20-95`): scanning rules in priority
  * order, the first matching rule contributes its function and/or ranges;
  * later matches (ultimately the default rule) fill whichever half is
  * still missing.
  */
final class RetentionResolver(rules: Seq[RetentionRule]) extends Serializable {
  require(rules.exists(_.isDefault), "a default (isDefault=true) rule is required")
  private val ordered = rules

  def resolve(name: String): MetricRetention = {
    var fn: String = ""
    var rng: Seq[(Int, Int)] = Nil
    val it = ordered.iterator
    while (it.hasNext && (fn.isEmpty || rng.isEmpty)) {
      val r = it.next()
      if (r.matches(name)) {
        if (fn.isEmpty && r.function.nonEmpty) fn = r.function
        if (rng.isEmpty && r.ranges.nonEmpty) rng = r.ranges
      }
    }
    MetricRetention(if (fn.isEmpty) "avg" else fn, if (rng.isEmpty) Seq(0 -> 1) else rng)
  }
}

object Retention {
  /** Default rule table mirroring the behavior of the reference's built-in
    * provider (`retention/DefaultRetentionProvider.java:29-118`): per-prefix
    * precision ladders with an `avg` rollup, catch-all 60s→300s→600s.
    */
  val defaultRules: Seq[RetentionRule] = Seq(
    RetentionRule("^one_sec", isDefault = false, "avg",
      Seq(0 -> 1, 3600 -> 5, 86400 -> 60, 604800 -> 300, 7776000 -> 600)),
    RetentionRule("^five_sec", isDefault = false, "avg",
      Seq(0 -> 5, 86400 -> 60, 604800 -> 300, 7776000 -> 600)),
    RetentionRule("^one_min", isDefault = false, "avg",
      Seq(0 -> 60, 604800 -> 300, 7776000 -> 600)),
    RetentionRule("^five_min", isDefault = false, "avg",
      Seq(0 -> 300, 7776000 -> 600)),
    RetentionRule("^one_hour", isDefault = false, "avg",
      Seq(0 -> 3600, 31536000 -> 86400)),
    RetentionRule("^one_day", isDefault = false, "avg",
      Seq(0 -> 86400)),
    RetentionRule(".*", isDefault = true, "avg",
      Seq(0 -> 60, 2592000 -> 300, 31104000 -> 600))
  )

  val defaultResolver: RetentionResolver = new RetentionResolver(defaultRules)
}
