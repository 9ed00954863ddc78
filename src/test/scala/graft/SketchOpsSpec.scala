package graft

import graft.ops.{RelOps, SimilarityOps, SketchOps}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked pins for the engine-portable sketches (HLL, Count-Min),
  * the matched-pairs closed form and the Mahalanobis outlier scan.
  */
class SketchOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- matchedPairs: the prefix-deficit identity vs hand-counted truth

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, t, ty) => (u, t, t, ty) } // event_id = sec (unique per user here)
      .toDF("user_id", "event_id", "sec", "event_type")

  test("matchedPairs: disjoint matching, each event used once") {
    // user 1: A A B B  -> 2 matched (maximum matching, not greedy-scan 1)
    // user 2: B A B B A B -> B1 unmatched; A1->B2, A2->B3... A2 at t5, B3 at t4?
    //   sequence: B(1) A(2) B(3) B(4) A(5) B(6): deficits 1,0,1,2,1,2 -> max 2; n_b=4 -> matched 2
    // user 3: B B A -> 0 matched (no A precedes any B)
    val df = ev(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "b"),
      (2L, 1L, "b"), (2L, 2L, "a"), (2L, 3L, "b"), (2L, 4L, "b"), (2L, 5L, "a"), (2L, 6L, "b"),
      (3L, 1L, "b"), (3L, 2L, "b"), (3L, 3L, "a"))
    val out = RelOps.matchedPairs(df, "a", "b")
      .select("user_id", "n_first", "n_second", "n_matched")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 2L, 2L), (2L, 2L, 4L, 2L), (3L, 1L, 2L, 0L)))
  }

  test("matchedPairs: interleaved A B A B matches all; other types ignored") {
    val df = ev((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "x"), (1L, 4L, "a"), (1L, 5L, "b"))
    val out = RelOps.matchedPairs(df, "a", "b")
      .select("n_matched", "match_rate").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((2L, 1.0)))
  }

  // ---- HLL: estimate quality + the small-range branch

  test("hllShingleDistinct: estimate within 3 sigma of exact on a real-sized set") {
    val docs = (0 until 400)
      .map(i => (i.toLong, s"alpha bravo charlie token$i delta echo ${i * 7} foxtrot", "s0"))
      .toDF("doc_id", "text", "source")
    val row = SketchOps.hllShingleDistinct(docs)
      .select("exact_n", "est_n", "rel_err").as[(Long, Double, Double)].head()
    val (exact, est, rel) = row
    assert(exact > 640, s"want the raw-estimate branch, got exact=$exact")
    // m=256 -> standard error 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5%
    assert(math.abs(rel) < 0.195, s"rel_err $rel too large (exact=$exact est=$est)")
  }

  test("hllShingleDistinct: small cardinality takes the linear-counting branch and is near-exact") {
    val docs = Seq((1L, "only a handful of words here", "s0")).toDF("doc_id", "text", "source")
    val (exact, est) = SketchOps.hllShingleDistinct(docs)
      .select("exact_n", "est_n").as[(Long, Double)].head()
    assert(exact < 100)
    // linear counting on a nearly-empty register file is tight
    assert(math.abs(est - exact) / exact.toDouble < 0.05,
      s"linear counting should be near-exact: exact=$exact est=$est")
  }

  test("hllMergeAudit: merged halves estimate the union within tolerance") {
    val docs = (0 until 300)
      .map(i => (i.toLong, s"uniq token$i phrase ${i * 13} mixed content tail", "s"))
      .toDF("doc_id", "text", "source")
    val r = SketchOps.hllMergeAudit(docs)
      .select("est_a", "est_b", "est_union", "exact_union", "rel_err")
      .as[(Double, Double, Double, Long, Double)].head()
    // merged registers dominate each half's registers, so the raw
    // estimate is monotone: union >= max(half); and it tracks the
    // exact union within 3 sigma (19.5%)
    assert(r._3 >= math.max(r._1, r._2) - 1e-9,
      s"union ${r._3} should dominate halves (${r._1}, ${r._2})")
    assert(math.abs(r._5) < 0.195, s"rel_err ${r._5}")
  }

  test("hllRollingDistinct: small daily sets take linear counting and are near-exact") {
    // 3 days x 40 users with 50% day-over-day churn; windows merge them
    val rows = for {
      d <- 0 until 3; u <- 0 until 40
    } yield (d * 86400L + u, (d * 20 + u).toLong, "view")
    val ev = rows.toDF("sec", "user_id", "event_type")
      .withColumn("event_id", org.apache.spark.sql.functions.col("sec"))
    val out = SketchOps.hllRollingDistinct(ev)
      .select("day", "exact_users", "est_users")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 3)
    // day 2's window covers all 3 days: exact = 80 distinct users
    val d2 = out.find(_._1 == 2L).get
    assert(d2._2 == 80L, s"exact=${d2._2}")
    out.foreach { case (d, exact, est) =>
      assert(math.abs(est - exact) / exact.toDouble < 0.1,
        s"day $d: exact=$exact est=$est") }
  }

  // ---- Count-Min: overestimate-only, exact when collisions are absent

  test("countMinAudit: never underestimates; exact for a tiny vocabulary") {
    val docs = Seq(
      (1L, "cat cat cat dog"), (2L, "cat dog bird"), (3L, "dog dog fish"))
      .toDF("doc_id", "text")
    val out = SketchOps.countMinAudit(docs, topK = 4)
      .select("term", "true_n", "est_n", "overcount")
      .as[(String, Long, Long, Long)].collect()
    assert(out.forall(_._4 >= 0), "CM must never underestimate")
    // 4 distinct terms into 4x256 cells: no collisions possible to
    // survive the min -> estimates are exact
    assert(out.forall(r => r._2 == r._3), out.mkString(", "))
    assert(out.toSet.map((r: (String, Long, Long, Long)) => (r._1, r._2)) ==
      Set(("cat", 4L), ("dog", 4L), ("bird", 1L), ("fish", 1L)))
  }

  // ---- Mahalanobis: a planted geometric outlier surfaces at rank 1

  test("mahalanobisOutliers: planted far-out vector ranks first") {
    val dims = 8
    val base = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dims)(d => 0.1f * ((i + d) % 5)))
    }
    val outlier = Seq((999L, Array.fill(dims)(25.0f)))
    val df = (base ++ outlier).toDF("vec_id", "embedding")
    val top = SimilarityOps.mahalanobisOutliers(df, dims = dims, topK = 3)
      .select("vec_id", "rank").as[(Long, Int)].collect().toMap
    assert(top.find(_._2 == 1).map(_._1).contains(999L), s"got $top")
  }
}
