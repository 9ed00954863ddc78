package graft

import graft.query.QueryParams
import graft.retention.{MetricRetention, Retention, RetentionResolver, RetentionRule}
import org.scalatest.funsuite.AnyFunSuite

/** Retention resolution + step-selection goldens (reference
  * CombinedRetentionProviderTest / MetricDataQueryParamsTest, FIXTURES.md §4/§6).
  */
class RetentionSpec extends AnyFunSuite {

  test("stepFor walks the age→step range map") {
    val r = MetricRetention("avg", Seq(0 -> 60, 2592000 -> 300, 31104000 -> 600))
    assert(r.stepFor(0) == 60)
    assert(r.stepFor(2591999) == 60)
    assert(r.stepFor(2592000) == 300)
    assert(r.stepFor(31104000) == 600)
    assert(r.stepFor(Int.MaxValue) == 600)
    assert(r.stepFor(-5) == 60, "negative age clamps to 0")
  }

  test("first full match wins") {
    val res = new RetentionResolver(Retention.defaultRules)
    assert(res.resolve("one_min.app.host1.requests").function == "avg")
    assert(res.resolve("one_min.app.host1.requests").stepFor(0) == 60)
    assert(res.resolve("five_min.abo.timings").stepFor(0) == 300)
    assert(res.resolve("whatever.else").stepFor(0) == 60)
    assert(res.resolve("whatever.else").stepFor(31104000) == 600)
  }

  test("partial rules combine: first function + first ranges") {
    val rules = Seq(
      RetentionRule("max$", isDefault = false, "max", Nil),            // aggregation-only
      RetentionRule("^one_hour", isDefault = false, "", Seq(0 -> 3600, 31536000 -> 86400)), // retention-only
      RetentionRule(".*", isDefault = true, "avg", Seq(0 -> 60, 2592000 -> 300))
    )
    val res = new RetentionResolver(rules)
    val m1 = res.resolve("one_hour.cpu.max")
    assert(m1.function == "max")
    assert(m1.stepFor(0) == 3600 && m1.stepFor(31536000) == 86400)
    val m2 = res.resolve("one_hour.cpu.avg")
    assert(m2.function == "avg" && m2.stepFor(0) == 3600)
    val m3 = res.resolve("one_min.cpu.max")
    assert(m3.function == "max" && m3.stepFor(0) == 60)
    val m4 = res.resolve("plain.metric")
    assert(m4.function == "avg" && m4.stepFor(0) == 60)
  }

  test("query params goldens (MetricDataQueryParamsTest)") {
    assert(QueryParams.create(Seq(60), 1542199569, 1542200159, -1) ==
      QueryParams(1542199560, 1542200100, 60))
    assert(QueryParams.create(Seq(60), 1542199569, 1542451570, 1000) ==
      QueryParams(1542199500, 1542451500, 300))
  }

  test("query params: step is max across metrics; empty → 1") {
    assert(QueryParams.create(Seq(60, 300, 5), 1000, 2000, -1).stepSeconds == 300)
    assert(QueryParams.create(Nil, 1000, 2000, -1).stepSeconds == 1)
    val p = QueryParams.create(Seq(1), 0, 10, 3) // 10 points > 3 → ratio 4
    assert(p.stepSeconds == 4 && p.pointCount == 2)
  }
}
