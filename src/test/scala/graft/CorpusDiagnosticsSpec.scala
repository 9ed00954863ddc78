package graft

import graft.ops.{DedupOps, SimilarityOps}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked pins for the corpus-diagnostic operators: snapshot
  * diff classification, power-iteration PCA, source-centroid cosine.
  */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("snapshotDiff: all four statuses; null-text docs compare as present") {
    val old = Seq(
      (1L, Some("alpha bravo")),  // unchanged
      (2L, Some("charlie")),      // changed
      (3L, Some("gone now")),     // removed
      (5L, None: Option[String])) // null text both sides -> unchanged
      .toDF("doc_id", "text")
    val neu = Seq(
      (1L, Some("alpha bravo")),
      (2L, Some("charlie DELTA")),
      (4L, Some("brand new")),    // added
      (5L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = DedupOps.snapshotDiff(old, neu)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"))
  }

  test("snapshotDiff: normalization-invariant (case/punctuation changes are unchanged)") {
    val old = Seq((1L, "Hello, World!")).toDF("doc_id", "text")
    val neu = Seq((1L, "hello world")).toDF("doc_id", "text")
    val out = DedupOps.snapshotDiff(old, neu).as[(Long, String)].head()
    assert(out == (1L, "unchanged"))
  }

  test("pcaTopComponent: recovers the dominant axis of a 2D line") {
    // points along direction (1, 2): top PC = (1,2)/sqrt(5), var_share = 1
    val pts = (-10 to 10).filter(_ != 0)
      .map(t => (t.toLong, Array(t.toFloat, 2.0f * t)))
      .toDF("vec_id", "embedding")
    val rows = SimilarityOps.pcaTopComponent(pts, dims = 2, iters = 10)
      .select("dim", "loading", "var_share")
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val (l0, l1) = (rows(0)._2, rows(1)._2)
    assert(math.abs(l0 - 1.0 / math.sqrt(5)) < 1e-3, s"l0=$l0")
    assert(math.abs(l1 - 2.0 / math.sqrt(5)) < 1e-3, s"l1=$l1")
    assert(math.abs(rows(0)._3 - 1.0) < 1e-3, s"var_share=${rows(0)._3}")
  }

  test("pcaTopComponent: lambda matches the known variance of the dominant axis") {
    // 1D spread along dim 0 only: lambda = population variance of x,
    // loading = (1, 0), var_share = 1
    val xs = Seq(-3.0f, -1.0f, 1.0f, 3.0f)
    val pts = xs.zipWithIndex.map { case (x, i) => (i.toLong, Array(x, 0.0f)) }
      .toDF("vec_id", "embedding")
    val rows = SimilarityOps.pcaTopComponent(pts, dims = 2, iters = 8)
      .select("dim", "loading", "lambda")
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(math.abs(rows(0)._2 - 1.0) < 1e-3)           // loading_0 = 1
    assert(math.abs(rows(1)._2) < 1e-3)                 // loading_1 = 0
    assert(math.abs(rows(0)._3 - 5.0) < 1e-3, s"lambda=${rows(0)._3}") // var = (9+1+1+9)/4
  }

  test("eventSeqPatterns: ordered-anywhere vs consecutive patterns") {
    val ev = Seq(
      // user 1: view click purchase (with a signup between) -> funnel yes
      (1L, 1L, 10L, "view"), (1L, 2L, 20L, "signup"), (1L, 3L, 30L, "click"),
      (1L, 4L, 40L, "purchase"),
      // user 2: three errors but interleaved -> NO burst; two consecutive -> no
      (2L, 1L, 10L, "error"), (2L, 2L, 20L, "view"), (2L, 3L, 30L, "error"),
      (2L, 4L, 40L, "error"),
      // user 3: three consecutive errors -> burst
      (3L, 1L, 10L, "error"), (3L, 2L, 20L, "error"), (3L, 3L, 30L, "error"))
      .toDF("user_id", "event_id", "sec", "event_type")
    val out = graft.ops.RelOps.eventSeqPatterns(ev, Seq(
        "funnel" -> "v.*c.*p", "burst" -> "eee"))
      .select("user_id", "n_events", "funnel", "burst")
      .as[(Long, Int, Boolean, Boolean)].collect().toSet
    assert(out == Set((1L, 4, true, false), (2L, 4, false, false), (3L, 3, false, true)))
  }

  test("bloomSemiJoinCount: identical to the plain join (no false negatives)") {
    val facts = (1 to 500).map(i => (i.toLong % 37, i.toLong))
      .toDF("user_id", "event_id")
    val keys = Seq(3L, 11L, 17L, 36L).toDF("user_id")
    val bloom = graft.ops.RelOps.bloomSemiJoinCount(facts, keys)
      .as[(Long, Long)].collect().toMap
    val plain = facts.join(keys, Seq("user_id"))
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(bloom == plain)
  }

  test("leakageSafeFolds: dup pairs never straddle folds; folds in [0, k)") {
    val docs = (1L to 40L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 20L)).toDF("id_a", "id_b")
    val folds = graft.ops.SampleOps.leakageSafeFolds(docs, edges, k = 4)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._3).toMap
    assert(folds.values.forall(f => f >= 0 && f < 4))
    assert(folds(1L) == folds(2L) && folds(2L) == folds(3L))
    assert(folds(10L) == folds(20L))
  }

  test("timeWeightedAvg: holding-interval weights, last observation excluded") {
    // 10 held for 10s, 20 held for 30s; the t=40 value never weighs in
    val ev = Seq((1L, 1L, 0L, Some(10.0)), (1L, 2L, 10L, Some(20.0)),
      (1L, 3L, 40L, Some(99.0)), (2L, 1L, 5L, Some(7.0))) // single event -> dropped
      .toDF("user_id", "event_id", "sec", "value")
    val out = graft.ops.RelOps.timeWeightedAvg(ev)
      .select("user_id", "span_sec", "twa").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 40L, 17.5))) // (10*10 + 20*30) / 40
  }

  test("cusumChangepoint: level shift located at the last point of the old regime") {
    val daily = Seq(("a", 0L, 5L), ("a", 1L, 5L), ("a", 2L, 5L),
      ("a", 3L, 15L), ("a", 4L, 15L)).toDF("g", "t", "n")
    val r = graft.ops.SeriesOps.cusumChangepoint(daily)
      .select("g", "mean", "max_abs_s", "cp_t", "flagged")
      .as[(String, Double, Double, Long, Boolean)].head()
    assert(r == (("a", 9.0, 12.0, 2L, true))) // S = -4,-8,-12,-6,0
  }

  test("transitionMatrix: counts and row-normalized probabilities") {
    val ev = Seq((1L, 1L, 0L, "a"), (1L, 2L, 1L, "b"), (1L, 3L, 2L, "a"), (1L, 4L, 3L, "b"))
      .toDF("user_id", "event_id", "sec", "event_type")
    val out = graft.ops.RelOps.transitionMatrix(ev)
      .select("from_type", "to_type", "n", "prob")
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("decayScore: one half-life halves the contribution") {
    val ev = Seq((1L, 604800L * 1, Some(10.0)), (1L, 0L, Some(10.0)))
      .toDF("user_id", "sec", "value")
    val r = graft.ops.RelOps.decayScore(ev)
      .select("n_events", "score").as[(Long, Double)].head()
    assert(r == ((2L, 15.0))) // 10 at the anchor + 10/2 one half-life old
  }

  test("rateAnomalies: spike flagged against trailing mean; short history unscored") {
    val daily = ((0L to 7L).map(t => ("a", t, 10L)) :+ (("a", 8L, 30L))).toDF("g", "t", "n")
    val byT = graft.ops.SeriesOps.rateAnomalies(daily)
      .select("t", "z", "anomaly").as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byT(8L) == ((Some(6.3246), true)))  // (30-10)/sqrt(10)
    assert(byT(1L) == ((None, false)))          // only 1 prior day
    assert(byT(5L) == ((Some(0.0), false)))     // flat series
  }

  test("ksTwoSample: identical samples d=0; disjoint samples d=1") {
    val a = (1 to 50).map(_.toLong % 5).toDF("n_chars")
    val same = graft.ops.ModelOps.ksTwoSample(a, a, "n_chars")
      .select("d", "reject").as[(Double, Boolean)].head()
    assert(same == ((0.0, false)))
    val b = (1 to 50).map(i => i.toLong % 5 + 100).toDF("n_chars")
    val disj = graft.ops.ModelOps.ksTwoSample(a, b, "n_chars")
      .select("d", "reject").as[(Double, Boolean)].head()
    assert(disj == ((1.0, true)))
  }

  test("waterfillAllocation: saturation, re-leveling, exact budget") {
    val srcs = Seq(("a", 1.0, 10L), ("b", 1.0, 100L), ("c", 1.0, 100L))
      .toDF("source", "weight", "capacity")
    val out = graft.ops.SampleOps.waterfillAllocation(srcs, budget = 60L)
      .select("source", "alloc", "saturated")
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map("a" -> ((10L, true)), "b" -> ((25L, false)), "c" -> ((25L, false))))
  }

  test("waterfillAllocation: budget above supply saturates everything; remainder goes to the tie-break winner") {
    val srcs = Seq(("a", 1.0, 7L), ("b", 1.0, 9L)).toDF("source", "weight", "capacity")
    val all = graft.ops.SampleOps.waterfillAllocation(srcs, budget = 100L)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(all == Map("a" -> 7L, "b" -> 9L)) // sum = supply, not budget
    val tie = Seq(("a", 1.0, 100L), ("b", 1.0, 100L)).toDF("source", "weight", "capacity")
    val t = graft.ops.SampleOps.waterfillAllocation(tie, budget = 5L)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(t == Map("a" -> 3L, "b" -> 2L)) // equal remainders -> src asc wins
  }

  test("ringAssign growth: moved keys land ONLY on the new shard") {
    val keys = (1L to 300L).toDF("doc_id")
    val before = graft.ops.SampleOps.ringAssign(keys, 4)
      .as[(Long, Int)].collect().toMap
    val after = graft.ops.SampleOps.ringAssign(keys, 5)
      .as[(Long, Int)].collect().toMap
    val moved = before.keys.filter(k => before(k) != after(k))
    assert(moved.nonEmpty && moved.size < 150, s"moved ${moved.size} of 300")
    assert(moved.forall(k => after(k) == 4),
      "ring growth must only move keys to the NEW shard")
  }

  test("trigramSearch: index candidates without contiguity die in the verify") {
    val docs = Seq(
      (1L, "we saw a fast merge happen here"),      // true match
      (2L, "FAST MERGE in caps"),                    // case-insensitive match
      (3L, "merge fast st me t m broken order"),     // all 8 trigrams, no contiguity
      (4L, "nothing relevant at all"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.trigramSearch(docs, "fast merge")
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 10, 2L -> 1))
    // the index (not the verify) must already have excluded doc 4
    val cand = graft.ops.TextOps.trigramPostings(docs)
      .filter(org.apache.spark.sql.functions.col("gram") === "fas")
      .select("doc_id").as[Long].collect().toSet
    assert(cand == Set(1L, 2L, 3L))
  }

  test("percentileNormalize: exact midrank percentiles within group") {
    val scored = Seq((1L, "s", 0.1), (2L, "s", 0.2), (3L, "s", 0.2), (4L, "s", 0.4),
      (5L, "t", 0.9)) // separate group: its only value sits at the median
      .toDF("doc_id", "source", "quality_score")
    val out = graft.ops.TextOps.percentileNormalize(scored)
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 0.125, 2L -> 0.5, 3L -> 0.5, 4L -> 0.875, 5L -> 0.5))
  }

  test("dedupSavings: dropped duplicate's characters attributed to its source") {
    val docs = Seq(
      (1L, "same text here", "a", 14L),
      (2L, "same text here", "b", 14L), // dup, dropped (min id wins)
      (3L, "unique content", "b", 14L))
      .toDF("doc_id", "text", "source", "n_chars")
    val m = graft.ops.DedupOps.dedupSavings(docs)
      .select("source", "n_dropped", "chars_dropped")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m == Map("a" -> ((0L, 0L)), "b" -> ((1L, 14L))))
  }

  test("sourceContainment: subset source fully contained, not vice versa") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot", "big"),
      (2L, "alpha bravo charlie", "small"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.DedupOps.sourceContainment(docs)
      .select("src_a", "src_b", "containment")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("small", "big")) == 1.0)
    assert(out(("big", "small")) < 1.0)
  }

  test("kneserNeyLm: hand-computed discount, continuation backoff, zero events") {
    // train (doc 1): bigrams "a b":2, "b a":1, "b c":1 -> nbb=3
    // held-out (doc 5): "a b" seen (P=(5*3+3*1*1)/24=0.75), "b x" zero
    // (seen ctx, unseen continuation), "x c"/"c a" ctx-unseen (P=1/3)
    val docs = Seq((1L, "a b a b c"), (5L, "a b x c a")).toDF("doc_id", "text")
    val r = graft.ops.TextOps.kneserNeyLm(docs)
      .select("doc_id", "n_bigrams", "n_ctx_unseen", "n_zero", "avg_nll")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 == 5L && r._2 == 4L && r._3 == 2L && r._4 == 1L)
    // avg of (0.415037, 1.584963, 1.584963) = 1.194988 -> 1.195
    assert(math.abs(r._5 - 1.195) < 1e-9, s"avg_nll=${r._5}")
  }

  test("negativeSamplingTable: unigram^0.75 flattens the head; cum ranges are increasing") {
    // "a" x16, "b" x1: raw ratio 16, flattened ratio 16^0.75 = 8
    val docs = Seq((1L, ("a " * 16) + "b")).toDF("doc_id", "text")
    val rows = graft.ops.TextOps.negativeSamplingTable(docs)
      .select("term", "p", "cum_p", "rank").as[(String, Double, Double, Int)]
      .collect().sortBy(_._4)
    assert(rows.map(_._1).toSeq == Seq("a", "b"))
    val ratio = rows(0)._2 / rows(1)._2
    assert(math.abs(ratio - 8.0) < 0.01, s"ratio $ratio")
    assert(rows(1)._3 == 1.0) // full table -> last cum range closes at 1
  }

  test("labelSpread: majority propagation, seed retention, tie to smallest, none for isolated") {
    val docs = (1L to 6L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    // comp {1,2,3}: seeds 1->7, 3->7, 2 unlabeled -> 7
    // comp {4,5}: seeds 4->2, 5->1 (tie) -> unlabeled none here; both own
    // doc 6: isolated, no seed -> none
    val seeds = Seq((1L, 7L), (3L, 7L), (4L, 2L), (5L, 1L)).toDF("id", "label")
    val out = graft.ops.GraphOps.labelSpread(docs, seeds, edges, seedIdCol = "id")
      .select("doc_id", "label", "label_src")
      .as[(Long, Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((Some(7L), "propagated")))
    assert(out(1L) == ((Some(7L), "own")) && out(4L) == ((Some(2L), "own")))
    assert(out(5L) == ((Some(1L), "own"))) // seed keeps its own label vs the tie
    assert(out(6L) == ((None, "none")))
  }

  test("sourceWeightedJaccard: rate differences lower the score below set Jaccard") {
    val docs = Seq((1L, "x x y", "a"), (2L, "x y y", "b"), (3L, "x x y", "c"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.DedupOps.sourceWeightedJaccard(docs)
      .select("src_a", "src_b", "weighted_jaccard")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", "c")) == 1.0)   // identical tf vectors
    assert(out(("a", "b")) == 0.5)   // min mass 2 over max mass 4
  }

  test("spearmanCorr: monotone agreement 1, reversal -1") {
    val up = (1 to 30).map(i => (i.toLong, i.toDouble, (i * i).toDouble))
      .toDF("doc_id", "x", "y")
    val r1 = graft.ops.ModelOps.spearmanCorr(up, "doc_id", "x", "y")
      .select("spearman").as[Double].head()
    assert(r1 == 1.0) // monotone nonlinear -> rank corr 1 (Pearson would not be)
    val down = (1 to 30).map(i => (i.toLong, i.toDouble, -i.toDouble))
      .toDF("doc_id", "x", "y")
    val r2 = graft.ops.ModelOps.spearmanCorr(down, "doc_id", "x", "y")
      .select("spearman").as[Double].head()
    assert(r2 == -1.0)
  }

  test("piiPrevalence: ordered counting — digits inside a URL never double-count") {
    val docs = Seq(
      (1L, "reach me a@b.org today", "s"),
      (2L, "see https://x.com/123456789 now", "s"), // 9 digits inside the URL
      (3L, "clean text", "s"))
      .toDF("doc_id", "text", "source")
    val r = graft.ops.TextOps.piiPrevalence(docs)
      .select("n_docs", "n_email", "n_url", "n_longnum", "docs_with_pii")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((3L, 1L, 1L, 0L, 2L)))
  }

  test("heapsLawCurve: all-new vocab fits beta 1, saturated vocab fits beta 0") {
    val fresh = (0 until 200)
      .map(i => (i.toLong, s"u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
    val b1 = graft.ops.TextOps.heapsLawCurve(fresh)
      .select("beta").as[Double].head()
    assert(math.abs(b1 - 1.0) < 0.01, s"beta=$b1")
    val same = (0 until 200).map(i => (i.toLong, "same three words")).toDF("doc_id", "text")
    val b0 = graft.ops.TextOps.heapsLawCurve(same)
      .select("beta").as[Double].head()
    assert(math.abs(b0) < 0.01, s"beta=$b0")
  }

  test("histogramPercentiles: estimates land within a bucket of exact") {
    val rows = (1 to 200).map(i => ("a", i / 100.0)).toDF("g", "v")
    val r = graft.ops.SketchOps.histogramPercentiles(rows)
      .select("n", "p50_err", "p90_err").as[(Long, Double, Double)].head()
    assert(r._1 == 200L)
    assert(r._2 <= 0.02 && r._3 <= 0.02, s"errors ${r._2}, ${r._3}")
  }

  test("sourceExemplars: the vector at the centroid ranks first") {
    val docs = Seq((1L, "s"), (2L, "s"), (3L, "s")).toDF("doc_id", "source")
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)),   // far
      (2L, Array(4.0f, 4.0f)),   // far, symmetric
      (3L, Array(2.0f, 2.0f)))   // exactly the centroid
      .toDF("vec_id", "embedding")
    val out = graft.ops.SimilarityOps.sourceExemplars(docs, emb, k = 3, dims = 2)
      .select("rank", "vec_id", "dist").as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out(0)._2 == 3L && out(0)._3 == 0.0)
    assert(out(1)._3 == out(2)._3) // symmetric distances tie
  }

  test("rboEval: identical lists 1.0, disjoint lists 0.0, top-weighted in between") {
    def list(q: Long, ids: Seq[Long]) =
      ids.zipWithIndex.map { case (n, i) => (q, n, i + 1) }
    val a = (list(1L, 1L to 10L) ++ list(2L, 1L to 10L) ++ list(3L, 1L to 10L))
      .toDF("query_id", "neighbor_id", "rank")
    val b = (list(1L, 1L to 10L)                  // identical
      ++ list(2L, 101L to 110L)                   // disjoint
      ++ list(3L, Seq(1L, 2L) ++ (201L to 208L))) // top-2 agree
      .toDF("query_id", "neighbor_id", "rank")
    val out = graft.ops.SimilarityOps.rboEval(a, b)
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
    assert(out(3L) > 0.2 && out(3L) < 1.0, s"partial=${out(3L)}")
  }

  test("nprobe sweep property: full probe equals brute force; recall non-decreasing") {
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(4)(d => ((i % 3) * 10 + 0.05f * ((i + d) % 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
    val exact = graft.ops.SimilarityOps.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id")
    def avgRecall(np: Int): Double = {
      val r = graft.ops.SimilarityOps.recallAtK(
        graft.ops.SimilarityOps.ivfTrainedTopK(q, emb, 5, np, kCells = 4), exact)
        .select("recall").as[Double].collect()
      r.sum / r.length
    }
    val curve = Seq(1, 2, 4).map(avgRecall)
    assert(curve(2) == 1.0, s"full probe must be exact: $curve")
    assert(curve == curve.sorted, s"recall must be non-decreasing: $curve")
  }

  test("zipfFit: an exact power law recovers its slope with r2 = 1") {
    // term t_r repeated round(1000 / r) times -> freq = 1000/rank, slope -1
    val words = (1 to 20).flatMap(r => Seq.fill(math.round(1000.0 / r).toInt)(f"t$r%02d"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = graft.ops.TextOps.zipfFit(docs, topK = 20)
      .select("n_terms", "slope", "r2").as[(Long, Double, Double)].head()
    assert(r._1 == 20L)
    assert(math.abs(r._2 - (-1.0)) < 0.01, s"slope=${r._2}")
    assert(r._3 > 0.999, s"r2=${r._3}")
  }

  test("sourceCentroidSimilarity: identical centroids cosine 1, orthogonal cosine 0") {
    val docs = Seq((1L, "sA"), (2L, "sA"), (3L, "sB"), (4L, "sC"))
      .toDF("doc_id", "source")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), // sA centroid (1,0)
      (3L, Array(2.0f, 0.0f)),                          // sB centroid (2,0): cos(sA,sB)=1
      (4L, Array(0.0f, 3.0f)))                          // sC centroid (0,3): orthogonal
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.sourceCentroidSimilarity(docs, emb, dims = 2)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("sA", "sB")) == 1.0)
    assert(out(("sA", "sC")) == 0.0)
    assert(out(("sB", "sC")) == 0.0)
  }

  test("canaryAudit: planted canaries found per source, clean sources report zero") {
    import graft.ops.TextOps
    val registry = Seq("canary-aaaa1111", "canary-bbbb2222", "canary-cccc3333")
    val docs = Seq(
      ("dirty", "some text with canary-aaaa1111 inside"),
      ("dirty", "more text canary-bbbb2222 here"),
      ("dirty", "an uncontaminated document"),
      ("dirty", "canary-aaaa1111 appears twice canary-aaaa1111"), // one doc, one canary
      ("clean", "nothing to see"),
      ("clean", "canary-zzzz9999 is NOT in the registry")
    ).toDF("source", "text")
    val got = TextOps.canaryAudit(docs, registry).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("dirty") === ((4L, 3L, 2L, 0.75))) // 3 docs hit, 2 distinct canaries
    assert(got("clean") === ((2L, 0L, 0L, 0.0)))
  }

  test("periodicityReport: period-2 chant flagged, varied prose is not; absent below 2 tokens") {
    import graft.ops.TextOps
    val docs = Seq(
      // ABAB... 16 tokens: p=2 matches 14/14, p=1 matches 0/15
      (1L, Seq.fill(8)("ab cd").mkString(" ")),
      // all-same 16 tokens: p=1 wins at 15/15 (smallest period on ties)
      (2L, Seq.fill(16)("xx").mkString(" ")),
      // varied prose: no period reaches 0.5
      (3L, "the quick brown fox jumps over the lazy dog today quietly somewhere"),
      (4L, "solo")
    ).toDF("doc_id", "text")
    val got = TextOps.periodicityReport(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L)) // "solo" has no valid period
    assert(got(1L) === ((16L, 2, 1.0, true)))
    assert(got(2L) === ((16L, 1, 1.0, true)))
    assert(!got(3L)._4 && got(3L)._3 < 0.5)
  }

  test("snapshotCentroidDrift: rotated source drifts, stable source stays at cosine 1") {
    // stable: identical vectors in both snapshots (drift 1.0);
    // rotated: x-axis centroid yesterday, y-axis today (drift 0.0);
    // only-a: present in one snapshot only -> absent from the report
    val docs = Seq(
      (0L, "stable"), (1L, "stable"), (2L, "rot"), (3L, "rot"), (4L, "only_a"))
      .toDF("doc_id", "source")
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)),
      (2L, Seq(1f, 0f)),   // yesterday's rot doc
      (3L, Seq(0f, 1f)),   // today's rot doc
      (4L, Seq(1f, 1f))
    ).toDF("vec_id", "embedding")
    val a = docs.filter(col("doc_id").isin(0L, 1L, 2L, 4L)) // yesterday
    val b = docs.filter(col("doc_id").isin(0L, 1L, 3L))     // today
    val got = SimilarityOps.snapshotCentroidDrift(a, b, emb, dims = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set("stable", "rot"))
    assert(got("stable") === ((2L, 2L, 1.0)))
    assert(got("rot") === ((1L, 1L, 0.0)))
  }
}
