package graft

import graft.search.{MetricSearchOps, MetricTrie}
import org.scalatest.funsuite.AnyFunSuite

/** The trie cache's contract is exact agreement with the relational
  * search path over the same tree state — verified here per query
  * family (literal, *, ?, classes, braces, dirs, invisible, invalid).
  */
class MetricTrieSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // append-only rows: (name, level, parent, status, updated) with a
  // status overwrite (b.cpu BAN then APPROVED) so currentTree matters
  private def treeRows = Seq(
    ("a.", 1, "", "SIMPLE", 1L),
    ("b.", 1, "", "SIMPLE", 1L),
    ("a.cpu.", 2, "a.", "SIMPLE", 2L),
    ("a.mem.", 2, "a.", "HIDDEN", 2L),
    ("a.cpu", 2, "a.", "SIMPLE", 2L),
    ("a.mem", 2, "a.", "SIMPLE", 2L),
    ("b.cpu", 2, "b.", "BAN", 2L),
    ("b.cpu", 2, "b.", "APPROVED", 3L),
    ("a.cpu.load1", 3, "a.cpu.", "SIMPLE", 4L),
    ("a.cpu.load5", 3, "a.cpu.", "SIMPLE", 4L),
    ("a.cpu.io_wait", 3, "a.cpu.", "AUTO_HIDDEN", 4L)
  ).toDF("name", "level", "parent", "status", "updated")

  private val queries = Seq(
    "a.cpu", "a.*", "*.cpu", "a.cpu.load?", "a.cpu.load[1-5]",
    "a.cpu.{load1,io_wait}", "a.{cpu,mem}", "?.c*u", "a.cpu.*",
    "nope.*", "a.cpu.[", "*", "a",
    // parity traps: escaped segment (backslash = not a literal name) and
    // trailing extra dots (split drops them; level counting doesn't)
    "a.cp\\u", "a.cpu..", "a.cpu.", "a.cpu.load1."
  )

  test("trie search equals relational search for every query family") {
    val df = treeRows
    val trie = MetricTrie.fromTree(df)
    queries.foreach { q =>
      val rel = MetricSearchOps.search(df, q).as[(String, String)].collect().toSet
      val fast = trie.search(q).toSet
      assert(fast === rel, s"query '$q'")
    }
  }

  test("applyDelta folds only new rows and matches a full rebuild") {
    val t0 = treeRows
    val trie = MetricTrie.fromTree(t0)
    // delta: one brand-new metric, one status flip of an existing one,
    // plus a same-second row (== watermark) that must re-apply, not drop
    val delta = Seq(
      ("a.cpu.load15", 3, "a.cpu.", "SIMPLE", 5L),
      ("b.cpu", 2, "b.", "HIDDEN", 6L),
      ("a.mem", 2, "a.", "HIDDEN", 4L) // same second as the old watermark
    ).toDF("name", "level", "parent", "status", "updated")
    val full = t0.unionByName(delta)
    val applied = trie.applyDelta(full)
    // 3 delta names + the 3 existing names AT the inclusive watermark
    // (updated=4) re-apply idempotently
    assert(applied === 6L)
    queries.foreach { q =>
      val rel = MetricSearchOps.search(full, q).as[(String, String)].collect().toSet
      assert(trie.search(q).toSet === rel, s"query '$q' after delta")
    }
    assert(trie.search("a.cpu.load15").nonEmpty)
    assert(trie.search("b.cpu").isEmpty, "status flip to HIDDEN applied")
    // second call with no new rows: only same-watermark rows re-apply
    // idempotently, results unchanged
    trie.applyDelta(full)
    assert(trie.search("a.cpu.*").toSet ===
      MetricSearchOps.search(full, "a.cpu.*").as[(String, String)].collect().toSet)
  }

  test("size reports one node per distinct path") {
    assert(MetricTrie.fromTree(treeRows).size === 8L) // a, b, a.cpu, a.mem, b.cpu, 3 leaves
  }

  test("maxNodes guard refuses oversized trees") {
    intercept[IllegalArgumentException](MetricTrie.fromTree(treeRows, maxNodes = 3))
  }
}
