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

  // queries intentionally without oracle SQL (driver falls back to its
  // rows-only check): sketch and Bloom-filter bit layouts are
  // engine-specific by nature (q83's one-sided-error contract is pinned
  // against q63's exact rates in PipelineOpsSpec instead)
  private val rowsOnlyByDesign = Set("q48_sketches", "q83_bloom_decon")

  test("every query has an oracle or is documented rows-only") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    assert((rowsOnlyByDesign -- SparkEntry.queries.keySet).isEmpty,
      "rows-only allowlist references unknown queries")
  }
}
