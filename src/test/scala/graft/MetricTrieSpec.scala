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

  test("withDelta overlap: back-dated writes within 120s apply, beyond it only a rebuild sees them") {
    val base = Seq(("s.", 1, "", "SIMPLE", 10000L), ("s.a", 2, "s.", "SIMPLE", 10000L))
    val trie = MetricTrie.fromTree(base.toDF("name", "level", "parent", "status", "updated"))
    assert(trie.deltaWatermark === 10000L)
    // stamped 9890 >= watermark - 120: the delta scan re-reads it
    val d1 = (base :+ ("s.b", 2, "s.", "SIMPLE", 9890L))
      .toDF("name", "level", "parent", "status", "updated")
    assert(trie.withDelta(d1).search("s.b").nonEmpty,
      "back-dated write inside the overlap window must re-apply")
    // stamped 9000 < watermark - 120: invisible to ANY incremental
    // refresh (this is why Graft tracks min-backdate and rebuilds)
    val d2 = (base :+ ("s.c", 2, "s.", "SIMPLE", 9000L))
      .toDF("name", "level", "parent", "status", "updated")
    assert(trie.withDelta(d2).search("s.c").isEmpty,
      "the delta scan must not see past the overlap window")
    assert(MetricTrie.fromTree(d2).search("s.c").nonEmpty, "a full rebuild does")
  }

  test("withDelta soak: chained refreshes race-free against concurrent readers") {
    // the hazard the round-5 code review found: an in-place-mutating
    // refresh tears state under a reader holding the same instance.
    // Path-copying must give every reader a frozen snapshot: repeated
    // reads of ONE instance agree, and the sequentially-added extras
    // are always a PREFIX (extra_k visible ⇒ all extra_j, j<k visible).
    val cols = Seq("name", "level", "parent", "status", "updated")
    val base = (("s.", 1, "", "SIMPLE", 1000L) +:
      (0 until 200).map(i => (s"s.m$i", 2, "s.", "SIMPLE", 1000L))).toDF(cols: _*)
    val gens = 12
    @volatile var current = MetricTrie.fromTree(base)
    @volatile var stop = false
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (1 to 3).map { r =>
      val th = new Thread(() => {
        while (!stop) {
          val t = current // hold ONE snapshot across several reads
          val a = t.search("s.*").length
          val vis = (1 to gens).map(k => t.search(s"s.extra$k").nonEmpty)
          val b = t.search("s.*").length
          if (a != b) errs.add(s"reader $r: snapshot changed size $a -> $b")
          val k = vis.takeWhile(identity).length
          if (vis.drop(k).contains(true)) errs.add(s"reader $r: non-prefix extras $vis")
          if (a != 200 + k) errs.add(s"reader $r: size $a but $k extras visible")
        }
      })
      th.start(); th
    }
    try {
      var rows = (("s.", 1, "", "SIMPLE", 1000L) +:
        (0 until 200).map(i => (s"s.m$i", 2, "s.", "SIMPLE", 1000L))).toVector
      (1 to gens).foreach { k =>
        rows = rows :+ ((s"s.extra$k", 2, "s.", "SIMPLE", 1000L + k))
        current = current.withDelta(rows.toDF(cols: _*))
      }
    } finally {
      stop = true
      readers.foreach(_.join(10000))
    }
    assert(errs.isEmpty, s"torn reads: ${errs.toArray.mkString("; ")}")
    assert(current.search("s.*").length === 200 + gens)
  }

  test("size reports one node per distinct path") {
    assert(MetricTrie.fromTree(treeRows).size === 8L) // a, b, a.cpu, a.mem, b.cpu, 3 leaves
  }

  test("maxNodes guard refuses oversized trees") {
    intercept[IllegalArgumentException](MetricTrie.fromTree(treeRows, maxNodes = 3))
  }
}
