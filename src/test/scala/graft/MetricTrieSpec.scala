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

  test("size reports one node per distinct path") {
    assert(MetricTrie.fromTree(treeRows).size === 8L) // a, b, a.cpu, a.mem, b.cpu, 3 leaves
  }

  test("maxNodes guard refuses oversized trees") {
    intercept[IllegalArgumentException](MetricTrie.fromTree(treeRows, maxNodes = 3))
  }
}
