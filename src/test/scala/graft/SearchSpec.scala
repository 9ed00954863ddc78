package graft

import graft.model.MetricStatus
import graft.search.MetricSearchOps
import org.scalatest.funsuite.AnyFunSuite

/** Tree search + status workflow over the append-only tree table
  * (reference MetricTreeTest workflows, FIXTURES.md §2/§5).
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tree = Seq(
    // name, level, parent, status, updated
    ("five_sec.", 1, "", "SIMPLE", 1L),
    ("five_sec.int_8742.", 2, "five_sec.", "SIMPLE", 1L),
    ("five_sec.int_8742.x1", 3, "five_sec.int_8742.", "SIMPLE", 1L),
    ("five_sec.int_8742.x2", 3, "five_sec.int_8742.", "SIMPLE", 1L),
    ("five_sec.int_8742.x2", 3, "five_sec.int_8742.", "HIDDEN", 5L), // latest wins
    ("five_sec.int_8743.", 2, "five_sec.", "BAN", 2L),
    ("five_sec.int_8743.x1", 3, "five_sec.int_8743.", "SIMPLE", 1L),
    ("one_min.", 1, "", "SIMPLE", 1L),
    ("one_min.m1", 2, "one_min.", "SIMPLE", 1L)
  ).toDF("name", "level", "parent", "status", "updated")

  test("currentTree dedups by latest updated") {
    val cur = MetricSearchOps.currentTree(tree)
    assert(cur.count() == 8)
    val x2 = cur.filter($"name" === "five_sec.int_8742.x2").select("status").as[String].collect()(0)
    assert(x2 == "HIDDEN")
  }

  test("glob search: pattern level + visibility") {
    def names(q: String): Set[String] =
      MetricSearchOps.search(tree, q).select("name").as[String].collect().toSet
    assert(names("five_sec.int_874?.x1") == Set("five_sec.int_8742.x1", "five_sec.int_8743.x1"))
    assert(names("five_sec.int_8742.x*") == Set("five_sec.int_8742.x1")) // x2 hidden
    assert(names("*") == Set("five_sec.", "one_min."))
    assert(names("five_sec.*") == Set("five_sec.int_8742.")) // 8743 banned
    assert(names("asdf[") == Set.empty, "invalid glob → empty")
  }

  test("searchMany resolves multiple patterns in one pass") {
    val names = MetricSearchOps.searchMany(tree,
      Seq("five_sec.int_874?.x1", "five_sec.int_8742."))
      .select("name").as[String].collect().toSet
    val one = MetricSearchOps.search(tree, "five_sec.int_874?.x1")
      .select("name").as[String].collect().toSet ++
      MetricSearchOps.search(tree, "five_sec.int_8742.")
        .select("name").as[String].collect().toSet
    assert(names == one, "one-pass OR equals the per-pattern union")
    assert(names.nonEmpty)
  }

  test("setStatus honors the restricted transition graph") {
    val updates = MetricSearchOps.setStatus(tree, "five_sec.int_874?.x1", MetricStatus.AutoHidden, 10L)
    val got = updates.select("name", "status").as[(String, String)].collect().toMap
    assert(got("five_sec.int_8742.x1") == "AUTO_HIDDEN")
    // BAN on the dir: SIMPLE must not reopen it — the restricted edge is
    // a no-op and a no-op appends NOTHING (the ban persists because
    // nothing newer is written)
    val banned = MetricSearchOps.setStatus(tree, "five_sec.int_8743.", MetricStatus.Simple, 11L)
    assert(banned.count() == 0)
  }

  test("dir visibility derives auto-hide from children") {
    val hiddenKids = Seq(
      ("d.", 1, "", "SIMPLE", 1L),
      ("d.m1", 2, "d.", "AUTO_HIDDEN", 1L),
      ("d.m2", 2, "d.", "HIDDEN", 1L),
      ("e.", 1, "", "SIMPLE", 1L),
      ("e.m1", 2, "e.", "SIMPLE", 1L)
    ).toDF("name", "level", "parent", "status", "updated")
    val vis = MetricSearchOps.dirVisibility(hiddenKids)
    val byDir = vis.filter($"dir" =!= "").select("dir", "auto_hide").as[(String, Boolean)].collect().toMap
    assert(byDir("d.") && !byDir("e."))
  }

  test("autohide candidates: few points and stale") {
    val data = Seq(
      ("m.live", 1.0, 100, 100), ("m.live", 2.0, 200, 200), ("m.live", 3.0, 999, 999),
      ("m.stale", 1.0, 100, 100)
    ).toDF("metric", "value", "timestamp", "updated")
    val got = MetricSearchOps.autoHideCandidates(data, maxValues = 2, cutoffSeconds = 500)
      .select("metric").as[String].collect().toSeq
    assert(got == Seq("m.stale"))
  }
}
