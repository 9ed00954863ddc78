package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() yields rows on sf0.001. */
class EntrySpec extends AnyFunSuite {
  test("entry returns non-empty flagship result") {
    val df = SparkEntry.entry(SparkTestBase.spark)
    val rows = df.count()
    assert(rows > 0)
    assert(df.columns.toSet == Set("metric", "start", "end", "step", "points"))
  }

  test("all queries run on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(SparkTestBase.spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("every query has an oracle or is documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
