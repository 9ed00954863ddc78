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

  // Every oracle query carries DuckDB SQL — the engine-specific forms
  // (built-in sketch/Bloom states, coded-key shuffle twins) live in
  // benchOnlyQueries, which Verify skips and Bench times.
  test("every query has an oracle; benchOnly stays disjoint") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val overlap = SparkEntry.benchOnlyQueries.keySet & SparkEntry.queries.keySet
    assert(overlap.isEmpty, s"benchOnly queries shadow oracle queries: $overlap")
  }

  test("all benchOnly twins run on sf0.001") {
    SparkEntry.benchOnlyQueries.foreach { case (name, fn) =>
      val n = fn(SparkTestBase.spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
