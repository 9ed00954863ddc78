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

  test("withDelta snapshots: new rows fold in, original trie untouched, rebuild parity") {
    val t0 = treeRows
    val trie = MetricTrie.fromTree(t0)
    // delta: a brand-new metric, a status flip of an existing one, and
    // an out-of-order row BEHIND the watermark but inside the 120s
    // overlap (updated=3 < wm=4) that must still apply
    val delta = Seq(
      ("a.cpu.load15", 3, "a.cpu.", "SIMPLE", 5L),
      ("b.cpu", 2, "b.", "HIDDEN", 6L),
      ("a.mem.free", 3, "a.mem.", "SIMPLE", 3L) // back-dated, within overlap
    ).toDF("name", "level", "parent", "status", "updated")
    val full = t0.unionByName(delta)
    val next = trie.withDelta(full)
    queries.foreach { q =>
      val rel = MetricSearchOps.search(full, q).as[(String, String)].collect().toSet
      assert(next.search(q).toSet === rel, s"query '$q' after delta")
    }
    assert(next.search("a.cpu.load15").nonEmpty)
    assert(next.search("b.cpu").isEmpty, "status flip to HIDDEN applied")
    assert(next.search("a.mem.free").nonEmpty,
      "back-dated row inside the overlap window must apply")
    // the ORIGINAL trie still answers from its snapshot (no mutation)
    assert(trie.search("a.cpu.load15").isEmpty)
    assert(trie.search("b.cpu").map(_._2) === Seq("APPROVED"))
    // a stale row older than the trie's stored version never regresses
    // state: re-applying the original rows on top of `next` is a no-op
    val again = next.withDelta(full)
    assert(again.search("b.cpu").isEmpty, "older APPROVED row must not undo the newer HIDDEN")
  }

  test("size reports one node per distinct path") {
    assert(MetricTrie.fromTree(treeRows).size === 8L) // a, b, a.cpu, a.mem, b.cpu, 3 leaves
  }

  test("maxNodes guard refuses oversized trees") {
    intercept[IllegalArgumentException](MetricTrie.fromTree(treeRows, maxNodes = 3))
  }
}
