package graft

import graft.ops.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components semantics: chains, direction-independence,
  * determinism of the canonical representative, empty input.
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("chain and triangle collapse to min-id components (both strategies)") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), // chain, mixed direction
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("id_a", "id_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // driver union-find path (default threshold) and distributed
    // propagation path (threshold 0) must agree exactly
    val viaDriver = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val viaPropagation = GraphOps.connectedComponents(edges, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver === expect)
    assert(viaPropagation === expect)
  }

  test("pointer jumping: a 300-deep chain converges in O(log n) rounds") {
    val n = 300
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    // plain propagation would need ~300 rounds; the jump needs ~log2(300)+slack
    val got = GraphOps.connectedComponents(edges, maxIter = 20, driverThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(got.length === n)
    assert(got.forall(_._2 == 1L))
  }

  test("dupClusters summarizes component membership deterministically") {
    val edges = Seq((5L, 2L), (2L, 9L), (7L, 8L)).toDF("id_a", "id_b")
    val got = GraphOps.dupClusters(edges)
      .select(col("keep_id"), col("cluster_size"), array_join(col("members"), ",").as("m"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((2L, 3L, "2,5,9"), (7L, 2L, "7,8")))
  }

  test("empty edge list yields empty components (both strategies)") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(GraphOps.connectedComponents(edges).count() === 0)
    // -1: even the empty (0-edge) list routes to the propagation branch
    assert(GraphOps.connectedComponents(edges, driverThreshold = -1L).count() === 0)
  }

  test("exhausting maxIter fails loudly instead of returning split components") {
    val edges = (1 until 2000).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    intercept[IllegalStateException](
      GraphOps.connectedComponents(edges, maxIter = 3, driverThreshold = 0L))
  }

  test("non-integral vertex ids are rejected, not silently dropped") {
    val edges = Seq(("a", "b")).toDF("id_a", "id_b")
    intercept[IllegalArgumentException](GraphOps.connectedComponents(edges))
  }

  test("random graphs: both strategies agree and satisfy CC invariants") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { round =>
      val nV = 40 + round * 30
      val edgeList = (0 until nV).map(_ =>
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val edges = edgeList.toDF("id_a", "id_b")
      val viaDriver = GraphOps.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      val viaProp = GraphOps.connectedComponents(edges, maxIter = 200, driverThreshold = -1L)
        .as[(Long, Long)].collect().toMap
      assert(viaDriver === viaProp, s"strategies disagree (round $round)")
      // invariant 1: both endpoints of every edge share a component
      edgeList.foreach { case (a, b) =>
        assert(viaDriver(a) === viaDriver(b), s"edge ($a,$b) split (round $round)")
      }
      // invariant 2: each component's label is its minimum member
      viaDriver.groupBy(_._2).foreach { case (label, members) =>
        assert(members.keys.min === label, s"label $label not min (round $round)")
      }
    }
  }

  test("clusterRepresentatives keeps the highest score, ties break to the lowest id") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scores = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), // tie at 0.9 → rep 2
      (10L, 0.2), (11L, 0.2),          // tie at 0.2 → rep 10
      (99L, 1.0)                       // not in any cluster → absent
    ).toDF("doc_id", "quality_score")
    val got = GraphOps.clusterRepresentatives(edges, scores)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((2L, 0.9, 3L)),
      10L -> ((10L, 0.2, 2L))))
  }

  test("kCore: multi-round cascade peels the chain, the clique survives; budget exhaustion refuses") {
    // K3 {1,2,3} plus the path 3-4-5-6: with k=2 the path peels one
    // vertex per round from the far end (6 → 5 → 4 — a 3-round
    // cascade), leaving exactly the triangle at degree 2.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = GraphOps.kCore(edges, k = 2, maxRounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // the same cascade cannot finish in 2 rounds: REFUSE, don't half-peel
    assertThrows[IllegalArgumentException] {
      GraphOps.kCore(edges, k = 2, maxRounds = 2).collect()
    }
    // k above the max degree: everything peels to the empty core
    assert(GraphOps.kCore(edges, k = 5, maxRounds = 8).count() === 0L)
  }

  test("triangleStats: triangle + pendant, dup/reversed/self edges collapse, star counts zero") {
    // triangle 1-2-3 with pendant 3-4; (2,1) repeats (1,2) reversed,
    // (2,2) is a self-loop — both must vanish in normalization.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L), (2L, 2L))
      .toDF("id_a", "id_b")
    val r = GraphOps.triangleStats(edges).collect()(0)
    // degrees 2,2,3,1 → wedges 1+1+3+0 = 5; one triangle; 3·1/5 = 0.6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      === ((4L, 4L, 5L, 1L, 0.6)))
    // star: hub 0 with 5 leaves — C(5,2)=10 wedges, no closures
    val star = (1L to 5L).map(l => (0L, l)).toDF("id_a", "id_b")
    val s = GraphOps.triangleStats(star).collect()(0)
    assert((r.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getDouble(4))
      === ((4L, 5L, 10L, 0L, 0.0)))
  }

  test("pageRankDirected: hand-computed iteration, direction carries endorsement, sink mass leaks") {
    import spark.implicits._
    // a→b, a→c, b→c: c is the endorsed sink, a only endorses.
    // p0 = 1/3 each; after one iteration (d=0.85):
    //   a: 0.15/3                         = 0.05  (nothing points at a)
    //   b: 0.05 + 0.85·(1/3·1/2)          = 0.191667
    //   c: 0.05 + 0.85·(1/3·1/2 + 1/3)    = 0.475
    val edges = Seq(("a", "b", 1.0), ("a", "c", 1.0), ("b", "c", 1.0))
      .toDF("src", "dst", "weight")
    val nodes = Seq("a", "b", "c").toDF("domain")
    val got = GraphOps.pageRankDirected(edges, nodes, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 0.05)
    assert(got("b") === 0.191667)
    assert(got("c") === 0.475)
    // the undirected form CANNOT see the asymmetry: there a inherits
    // back through its own out-links
    val und = GraphOps.pageRank(edges, nodes, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(und("a") > got("a"), "undirected symmetrization feeds rank back to the endorser")
  }

  test("hits: hand-computed iteration — hubs and authorities separate where one PR number cannot") {
    import spark.implicits._
    // a→b, a→c, b→c; h0 = 1 each.
    //   a1 ∝ (b: 1, c: 2) → a = 0, b = 1/3, c = 2/3
    //   h1 ∝ (a: 1/3 + 2/3 = 1, b: 2/3) → a = 0.6, b = 0.4, c = 0
    val edges = Seq(("a", "b", 1.0), ("a", "c", 1.0), ("b", "c", 1.0))
      .toDF("src", "dst", "weight")
    val nodes = Seq("a", "b", "c").toDF("domain")
    val got = GraphOps.hits(edges, nodes, iters = 1).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got("a") === ((0.6, 0.0)))      // pure hub
    assert(got("b") === ((0.4, 0.333333))) // both roles
    assert(got("c") === ((0.0, 0.666667))) // pure authority
  }
}
