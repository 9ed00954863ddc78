package graft

import graft.ops.{SampleOps, SeriesOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit goldens for the graphite function layer (SeriesOps), the
  * deterministic sampling/split operators, and PII redaction.
  */
class SeriesSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def series = Seq(
    ("m1", 0L, 10.0), ("m1", 60L, 13.0), ("m1", 120L, 11.0), ("m1", 180L, 20.0),
    ("m2", 0L, 5.0), ("m2", 60L, 5.0)
  ).toDF("metric", "ts", "v")

  test("derivative / nonNegativeDerivative / perSecond") {
    val out = SeriesOps.perSecond(
      SeriesOps.nonNegativeDerivative(SeriesOps.derivative(series)), stepSeconds = 60)
      .filter(col("metric") === "m1").orderBy("ts")
      .select("derivative", "nn_derivative", "per_second")
      .as[(Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(out === Seq(
      (None, None, None),
      (Some(3.0), Some(3.0), Some(0.05)),
      (Some(-2.0), None, Some(-2.0 / 60)),
      (Some(9.0), Some(9.0), Some(0.15))))
  }

  test("summarize re-buckets with epoch-aligned boundaries") {
    val out = SeriesOps.summarize(series, 120, "sum")
      .orderBy("metric", "ts").as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("m1", 0L, 23.0), ("m1", 120L, 31.0), ("m2", 0L, 10.0)))
  }

  test("summarize rejects unknown functions") {
    intercept[IllegalArgumentException](SeriesOps.summarize(series, 120, "median"))
  }

  test("timeShift is a pure ts projection; integral accumulates per series") {
    val out = SeriesOps.integral(SeriesOps.timeShift(series, -60))
      .filter(col("metric") === "m1").orderBy("ts")
      .select("ts", "integral").as[(Long, Double)].collect().toSeq
    assert(out === Seq((-60L, 10.0), (0L, 23.0), (60L, 34.0), (120L, 54.0)))
  }

  test("scale / offset / absolute") {
    val out = series.filter(col("metric") === "m2").orderBy("ts")
      .select(SeriesOps.scale(col("v"), 2.0), SeriesOps.offset(col("v"), -8.0),
        SeriesOps.absolute(col("v") - 7.0))
      .as[(Double, Double, Double)].collect().toSeq
    assert(out === Seq((10.0, -3.0, 2.0), (10.0, -3.0, 2.0)))
  }

  test("assignSplit is deterministic, exhaustive, and roughly proportioned") {
    val ids = (0L until 2000L).toDF("id")
    val counts = ids.select(SampleOps.assignSplit(col("id")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "valid", "test"))
    assert(counts("train") > 1600 && counts("train") < 1950)
    assert(counts.values.sum === 2000)
    // repeated evaluation gives identical assignment (content-hash, no seed)
    val again = ids.select(SampleOps.assignSplit(col("id")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(again === counts)
  }

  test("deterministicKeep tracks the requested fraction and nests monotonically") {
    val ids = (0L until 5000L).toDF("id")
    val k10 = ids.filter(SampleOps.deterministicKeep(col("id"), 0.1))
    val k30 = ids.filter(SampleOps.deterministicKeep(col("id"), 0.3))
    val n10 = k10.count(); val n30 = k30.count()
    assert(math.abs(n10 - 500) < 150, s"10% sample was $n10")
    assert(math.abs(n30 - 1500) < 250, s"30% sample was $n30")
    // nesting: a row kept at 10% is kept at 30% (buckets are a prefix range)
    assert(k10.join(k30, Seq("id"), "left_anti").count() === 0)
  }

  test("redact replaces each PII category; piiCounts audits them") {
    val df = Seq(
      "mail me at a.user+tag@example.co.uk or visit https://x.io/p?q=1",
      "server 10.0.255.3 answered, call +1 (415) 555-0199 today",
      "order 1234567890123 shipped; short 12345 stays",
      "clean text",
      "scheme case: HTTPS://Example.com/u/a?tok=x"
    ).toDF("text").select(TextOps.redact(col("text")).as("r"),
      TextOps.piiCounts(col("text")).as("c"))
    val rows = df.select(col("r"), col("c.n_email"), col("c.n_url"), col("c.n_ipv4"),
      col("c.n_phone"), col("c.n_longnum"))
      .as[(String, Int, Int, Int, Int, Int)].collect().toSeq
    assert(rows(0)._1 === "mail me at <EMAIL> or visit <URL>")
    assert((rows(0)._2, rows(0)._3) === (1, 1))
    assert(rows(1)._1 === "server <IP> answered, call <PHONE> today")
    assert((rows(1)._4, rows(1)._5) === (1, 1))
    assert(rows(2)._1 === "order <NUM> shipped; short 12345 stays")
    assert(rows(2)._6 === 1)
    assert(rows(3)._1 === "clean text")
    assert((rows(3)._2 + rows(3)._3 + rows(3)._4 + rows(3)._5 + rows(3)._6) === 0)
    assert(rows(4)._1 === "scheme case: <URL>")
  }

  test("langIdFrame and qualityFrame match the column forms exactly") {
    val docs = Seq(
      (1L, "The quick brown fox and the lazy dog sit in a field of grass, it is fine."),
      (2L, "Der schnelle braune Fuchs und der Hund, das ist nicht ein Problem!"),
      (3L, "это не проблема и он в порядке"),
      (4L, ""),
      (5L, "12345 67890 !!!"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val frameLang = TextOps.langIdFrame(docs).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    val colLang = docs.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(frameLang === colLang)
    // null text must anchor at "und", not propagate NULL through the hit arrays
    assert(frameLang.find(_._1 == 6L).map(_._2) === Some("und"))
    val f = TextOps.qualityFeatures(col("text"))
    val frameQ = TextOps.qualityFrame(docs).orderBy("doc_id").collect().toSeq
    val colQ = docs.select(col("doc_id"), f.getField("n_chars").as("n_chars"),
      f.getField("n_tokens").as("n_tokens"), f.getField("punct_ratio").as("punct_ratio"),
      f.getField("alpha_ratio").as("alpha_ratio"), f.getField("stopword_ratio").as("stopword_ratio"),
      f.getField("mean_word_len").as("mean_word_len"),
      TextOps.qualityScore(col("text")).as("quality_score")).orderBy("doc_id").collect().toSeq
    assert(frameQ === colQ)
  }

  test("non-Latin and null-text docs keep distinct fingerprint groups") {
    val docs = Seq(
      (1L, "привет мир"), (2L, "другой текст"),  // distinct Cyrillic docs
      (3L, "привет мир"),                        // true dup of 1
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]),
      (6L, "hello world"), (7L, "Hello, world!") // Latin: normalized dup
    ).toDF("doc_id", "text")
    val out = graft.ops.DedupOps.exactDedup(docs)
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // {1,3} merge; 2 alone; null-text docs 4 and 5 stay separate; {6,7} merge
    assert(out === Seq((1L, 2L), (2L, 1L), (4L, 1L), (5L, 1L), (6L, 2L)))
  }

  test("stratifiedSample: per-stratum fractions, absent strata keep nothing, reproducible") {
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "ko")).toDF("id", "lang")
    val kept = SampleOps.stratifiedSample(df, "lang", "id", Map("en" -> 0.25, "fr" -> 1.0))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("ko"), "stratum absent from the map must keep nothing")
    // hash-Bernoulli at 25% of 2000: near expectation, not exact
    assert(kept("en") > 400 && kept("en") < 600, s"got ${kept("en")}")
    val again = SampleOps.stratifiedSample(df, "lang", "id", Map("en" -> 0.25, "fr" -> 1.0))
      .select("id").as[Long].collect().sorted.toSeq
    val first = SampleOps.stratifiedSample(df, "lang", "id", Map("en" -> 0.25, "fr" -> 1.0))
      .select("id").as[Long].collect().sorted.toSeq
    assert(again === first)
  }

  test("tokenBudgetPack: greedy hash-order prefix, crossing doc admitted, groups isolated") {
    val df = Seq(
      ("s1", 1L, 800L), ("s1", 2L, 800L), ("s1", 3L, 800L), ("s1", 4L, 800L),
      ("s2", 10L, 50L)
    ).toDF("source", "doc_id", "n_tokens")
    val got = SampleOps.tokenBudgetPack(df, "source", "doc_id", "n_tokens", 2000L)
    val bySource = got.collect().groupBy(_.getString(0))
    // s1: docs admitted in hash order until cum reaches 2000 — exactly 3
    // of the 800-token docs (800, 1600, 2400: the crosser is admitted)
    assert(bySource("s1").length === 3)
    assert(bySource("s1").map(_.getLong(3)).max === 2400L)
    // s2 far under budget: everything admitted
    assert(bySource("s2").map(r => (r.getLong(1), r.getLong(3))).toSeq === Seq((10L, 50L)))
    // determinism: the admitted s1 set is the hash-order prefix, not id order
    val order = df.filter(col("source") === "s1")
      .select(col("doc_id")).as[Long].collect()
      .sortBy(id => (SampleOpsTestHash.bucket(id), id)).take(3).toSet
    assert(bySource("s1").map(_.getLong(1)).toSet === order)
  }

  test("tokenBudgetPack: hash-prefix pre-filter leaves the packed set identical") {
    // 400 docs × ~50 tokens in one source: total 20000 ≫ 4 × budget 500,
    // so the prefix cut actually engages; the admitted set must equal
    // the pure hash-order greedy pack computed in plain Scala
    val df = (0L until 400L).map(i => ("big", i, 40L + i % 20)).toDF("source", "doc_id", "n_tokens")
    val got = SampleOps.tokenBudgetPack(df, "source", "doc_id", "n_tokens", 500L,
        preFilterEngageRatio = 1.0) // force the cut at test scale
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    val expected = {
      var cum = 0L
      (0L until 400L).map(i => (i, 40L + i % 20))
        .sortBy { case (id, _) => (SampleOpsTestHash.bucket(id), id) }
        .iterator.takeWhile { case (_, _) => cum < 500L }
        .map { case (id, t) => cum += t; (id, cum) }.toMap
    }
    assert(got === expected)
  }

  test("tokenBudgetPack: short-prefix fallback still packs exactly (margin 1 stress)") {
    // margin 1.0 sizes the prefix at exactly one budget of expected
    // mass — underfull prefixes become likely, forcing the exact-repack
    // path; the result must STILL be the full greedy pack
    val df = (0L until 200L).map(i => ("s", i, 100L)).toDF("source", "doc_id", "n_tokens")
    val got = SampleOps.tokenBudgetPack(df, "source", "doc_id", "n_tokens", 950L,
      preFilterMargin = 1.0, preFilterEngageRatio = 1.0)
      .select("doc_id").as[Long].collect().toSet
    val expected = (0L until 200L)
      .sortBy(id => (SampleOpsTestHash.bucket(id), id)).take(10).toSet // 10 × 100 ≥ 950
    assert(got === expected)
    // null group keys ride the exact path untouched
    val withNull = df.unionByName(Seq((null.asInstanceOf[String], 999L, 10L))
      .toDF("source", "doc_id", "n_tokens"))
    val nulls = SampleOps.tokenBudgetPack(withNull, "source", "doc_id", "n_tokens", 950L)
      .filter(col("source").isNull).select("doc_id", "cum_tokens").as[(Long, Long)].collect().toSeq
    assert(nulls === Seq((999L, 10L)))
  }

  test("tokenBudgetPack: a group whose ENTIRE prefix was cut still packs (no vanishing groups)") {
    // one huge source engages the cut globally; a second source holds a
    // single doc heavier than margin × budget, so keepAll is false and a
    // tiny frac can cut its only row — the empty superset must be
    // detected as failed and repacked, never dropped from the output
    val huge = (0L until 300L).map(i => ("huge", i, 100L))
    // budget 100, margin 1: frac = 100/100000 = 0.1% → the single row is
    // cut with near-certainty whatever its hash
    val heavy = Seq(("heavy", 9999L, 100000L))
    val df = (huge ++ heavy).toDF("source", "doc_id", "n_tokens")
    val got = SampleOps.tokenBudgetPack(df, "source", "doc_id", "n_tokens", 100L,
      preFilterMargin = 1.0, preFilterEngageRatio = 1.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(got.contains("heavy"), "whole-prefix-cut group vanished from the pack")
    assert(got("heavy") === 1L)
    assert(got("huge") === 1L) // 100-token docs: the first crosser fills the budget
  }

  test("tokenBudgetPack: q99's configuration engages the cut; sub-threshold input stays plain") {
    // q99's exact knobs (budget 100, margin 2, ratio 2 → threshold 400):
    // a 1000-token group must take the cut path — visible as the
    // fast/exact-tail Union in the plan — while a 300-token group plans
    // the plain single window
    def plan(mass: Seq[(String, Long, Long)]): String =
      SampleOps.tokenBudgetPack(mass.toDF("source", "doc_id", "n_tokens"),
        "source", "doc_id", "n_tokens", 100L,
        preFilterMargin = 2.0, preFilterEngageRatio = 2.0)
        .queryExecution.optimizedPlan.toString
    val engaged = plan((0L until 100L).map(i => ("s", i, 10L)))
    assert(engaged.contains("Union"), "expected the hash-prefix cut path (fast ∪ exact tail)")
    val plain = plan((0L until 30L).map(i => ("s", i, 10L)))
    assert(!plain.contains("Union"), "sub-threshold group must keep the plain window plan")
  }

  test("sequencePack: window index, offset, and boundary straddle from the running sum") {
    // force a known order with distinct hash buckets: verify arithmetic
    // independent of which doc hashes first by recomputing expectations
    val df = Seq(("s", 1L, 700L), ("s", 2L, 700L), ("s", 3L, 700L), ("s", 4L, 100L))
      .toDF("source", "doc_id", "n_tokens")
    val got = SampleOps.sequencePack(df, "source", "doc_id", "n_tokens", 1024L)
      .select("doc_id", "seq_idx", "seq_offset", "crosses_boundary")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    var cum = 0L
    val expected = Seq(1L, 2L, 3L, 4L)
      .sortBy(id => (SampleOpsTestHash.bucket(id), id))
      .map { id =>
        val t = if (id == 4L) 100L else 700L
        val start = cum; cum += t
        id -> ((start / 1024L, start % 1024L, (cum - 1) / 1024L != start / 1024L))
      }.toMap
    assert(got === expected)
    // sanity on the fixed arithmetic: first doc starts window 0 offset 0
    val first = Seq(1L, 2L, 3L, 4L).minBy(id => (SampleOpsTestHash.bucket(id), id))
    assert(got(first)._1 === 0L && got(first)._2 === 0L)
  }

  test("chunkFrame: stride windows, short last chunk, empty docs yield none") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "")                                        // 0 tokens → no chunks
    ).toDF("doc_id", "text")
    val got = TextOps.chunkFrame(docs, chunkTokens = 4, strideTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9 → 4 chunks; last has 1 token
    assert(d1.map(c => (c._3, c._4)) === Seq((0L, 4L), (3L, 4L), (6L, 4L), (9L, 1L)))
    assert(d1.head._5 === "w1 w2 w3 w4")
    assert(d1.last._5 === "w10")
    assert(got.filter(_._1 == 2L).map(_._5).toSeq === Seq("only three tokens"))
    assert(!got.exists(_._1 == 3L))
  }

  test("deterministicKeep hits the exact bucket threshold for binary-inexact fractions") {
    val ids = (0L until 20000L).toDF("id")
    // 0.3 * 10000 = 2999.999... in double; truncation would lose bucket 2999
    val buckets = ids.filter(SampleOps.deterministicKeep(col("id"), 0.3))
      .select(SampleOps.hashBucket(col("id"), 10000).as("b"))
    assert(buckets.agg(max(col("b"))).as[Long].head() === 2999L)
  }

  test("shardShuffle: layout-independent permutation, contiguous per-shard positions, seed changes order") {
    val ids = (0L until 5000L).toDF("doc_id")
    val a = SampleOps.shardShuffle(ids, "doc_id", numShards = 8, seed = 42L)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // repartitioned input yields the IDENTICAL permutation
    val b = SampleOps.shardShuffle(ids.repartition(7), "doc_id", numShards = 8, seed = 42L)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(a === b, "permutation must not depend on input layout")
    // every shard's positions are exactly 0..count-1
    a.groupBy(_._2._1).foreach { case (shard, rows) =>
      val ps = rows.values.map(_._2).toSeq.sorted
      assert(ps === (0L until ps.length.toLong), s"shard $shard positions not contiguous")
    }
    // all shards populated and no shard hogs the corpus (hash balance)
    val sizes = a.groupBy(_._2._1).map(_._2.size)
    assert(sizes.size === 8 && sizes.max < 2 * sizes.min + 64, s"imbalanced shards: $sizes")
    // a different seed produces a genuinely different permutation
    val c = SampleOps.shardShuffle(ids, "doc_id", numShards = 8, seed = 43L)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(a !== c, "seed must change the permutation")
  }

  test("shardShuffle under corpus growth: shard and relative order stable, shard_pos is not") {
    // The incremental contract, pinned exactly: when new docs arrive,
    // (1) every old doc keeps its SHARD (pure id-hash function);
    // (2) the RELATIVE ORDER of old docs within a shard is unchanged
    //     (new docs interleave, they never swap old neighbors);
    // (3) absolute shard_pos values are NOT stable — an inserted doc
    //     shifts every old doc behind it up by one. Consumers that
    //     need resumable addressing must key on (shard, id-hash
    //     order), not on a stored shard_pos.
    val before = SampleOps.shardShuffle((0L until 3000L).toDF("doc_id"),
        "doc_id", numShards = 4, seed = 42L)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val after = SampleOps.shardShuffle((0L until 4000L).toDF("doc_id"),
        "doc_id", numShards = 4, seed = 42L)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // (1) shard assignment of every pre-existing doc is unchanged
    before.foreach { case (id, (shard, _)) =>
      assert(after(id)._1 == shard, s"doc $id changed shard under growth")
    }
    // (2) within each shard, old docs ordered by old pos are a
    //     subsequence of the new order: sorting them by NEW pos must
    //     not permute them
    before.groupBy(_._2._1).foreach { case (shard, rows) =>
      val oldOrder = rows.toSeq.sortBy(_._2._2).map(_._1)
      val newOrder = rows.toSeq.sortBy(r => after(r._1)._2).map(_._1)
      assert(oldOrder == newOrder, s"shard $shard relative order changed under growth")
    }
    // (3) the growth DID move absolute positions (the 1000 new docs
    //     hash uniformly — some land mid-shard), so a consumer pinning
    //     shard_pos would silently re-read different rows
    assert(before.exists { case (id, (_, pos)) => after(id)._2 != pos },
      "expected at least one shifted shard_pos; the instability this test documents")
  }

  test("divideSeries: pointwise ratio, null on zero or missing divisor, grid preserved") {
    val num = Seq(("a", 0L, 10.0), ("a", 60L, 6.0), ("a", 120L, 4.0), ("b", 0L, 1.0))
      .toDF("metric", "ts", "v")
    val den = Seq((0L, 2.0), (60L, 0.0)).toDF("ts", "v") // 120 missing
    val got = SeriesOps.divideSeries(num, den)
      .select("metric", "ts", "ratio")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(got === Map(
      ("a", 0L) -> Some(5.0), ("a", 60L) -> None, ("a", 120L) -> None,
      ("b", 0L) -> Some(0.5)))
  }

  test("movingMedian: odd/even interpolation, null skipping, per-series windows") {
    val pts = Seq(
      ("m1", 0L, Some(10.0)), ("m1", 60L, Some(2.0)), ("m1", 120L, Some(100.0)),
      ("m1", 180L, None), ("m2", 0L, Some(7.0))
    ).toDF("metric", "ts", "v")
    val got = SeriesOps.movingMedian(pts, points = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(3))).toMap
    assert(got(("m1", 0L)) === Some(10.0))          // window {10}
    assert(got(("m1", 60L)) === Some(6.0))          // {2,10} → interpolated
    assert(got(("m1", 120L)) === Some(10.0))        // {2,10,100}
    assert(got(("m1", 180L)) === Some(51.0))        // {2,100,null} → {2,100}
    assert(got(("m2", 0L)) === Some(7.0))           // series isolation
  }

  test("linearTrend recovers an exact line and nulls degenerate series") {
    // m1: v = 3 + 2x at ts = 0,60,120,180 (x = ts/60) — exact fit
    val pts = Seq(
      ("m1", 0L, 3.0), ("m1", 60L, 5.0), ("m1", 120L, 7.0), ("m1", 180L, 9.0),
      ("m2", 0L, 42.0) // single point: zero x-variance
    ).toDF("metric", "ts", "v")
    val got = SeriesOps.linearTrend(pts, x0 = 0L, xStep = 60L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    val (n1, s1, i1) = got("m1")
    assert(n1 === 4L && math.abs(s1.get.asInstanceOf[Double] - 2.0) < 1e-12
      && math.abs(i1.get.asInstanceOf[Double] - 3.0) < 1e-12)
    assert(got("m2") === ((1L, None, None)))
  }

  test("removeAbovePercentile keeps points at or below the per-series cutoff") {
    // m1 values 1..20: p95 (interpolated) = 19.05; drops exactly 20.0
    val pts = (1 to 20).map(i => ("m1", i.toLong, i.toDouble)) ++
      Seq(("m2", 1L, 100.0), ("m2", 2L, 1.0)) // m2 cutoff 95.05: keeps 1.0, drops 100.0
    val got = SeriesOps.removeAbovePercentile(pts.toDF("metric", "ts", "v"), 0.95)
    val kept = got.collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(!kept.contains(("m1", 20.0)) && kept.contains(("m1", 19.0)))
    assert(kept.contains(("m2", 1.0)) && !kept.contains(("m2", 100.0)))
    assert(got.filter(col("metric") === "m1").count() === 19)
  }

  test("curriculumSchedule: quantile stages are score-monotone, per-(stage,shard) positions dense") {
    val scored = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "avg_nll")
    val got = SampleOps.curriculumSchedule(scored, stages = 3, shards = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // terciles of 1..9: t1 = 3.667, t2 = 6.333 → stages {1,2,3},{4,5,6},{7,8,9}
    assert((1L to 3L).forall(got(_)._1 === 1) && (4L to 6L).forall(got(_)._1 === 2)
      && (7L to 9L).forall(got(_)._1 === 3), s"stage split wrong: $got")
    // positions dense 0..n-1 within each (stage, shard)
    got.values.groupBy(v => (v._1, v._2)).foreach { case (k, vs) =>
      assert(vs.map(_._3).toSeq.sorted === (0L until vs.size.toLong), s"positions not dense in $k")
    }
  }

  test("dsirWeights: target-like raw docs outscore off-target, top quantile selected") {
    val docs = Seq(
      (1L, "aa bb", "tgt"),        // the target exemplar
      (2L, "aa aa bb", "raw"),     // raw, token distribution ≈ target
      (3L, "zz zz zz", "raw")      // raw, no target token mass
    ).toDF("doc_id", "text", "source")
    val got = SampleOps.dsirWeights(docs, col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.keySet === Set(2L, 3L), "only raw docs are scored")
    assert(got(2L)._1 === 3L && got(3L)._1 === 3L)
    assert(got(2L)._2 > got(3L)._2, s"target-like doc must outscore: $got")
    // 0.75-quantile of two weights interpolates between them → only the top doc clears it
    assert(got(2L)._3 && !got(3L)._3)
  }

  test("doremiWeights: hard source earns an exp(excess) boost, easy source boost 1") {
    val scored = Seq(
      ("a", 100L, 5.0), ("a", 100L, 5.0), // easy: mean 5, 2/3 of tokens
      ("b", 100L, 10.0)                   // hard: mean 10
    ).toDF("source", "n_tokens", "avg_nll")
    val got = SampleOps.doremiWeights(scored).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // corpus mean = (2·50000·100 + 100000·100)/300/1e4 = 6.6667
    val (shareA, _, exA, boostA, _) = got("a")
    val (shareB, meanB, exB, boostB, wB) = got("b")
    assert(shareA === 0.666667 && shareB === 0.333333 && meanB === 10.0)
    assert(exA === 0.0 && boostA === 1.0)
    assert(exB === 3.3333)
    val expBoost = math.floor(math.exp(3.3333) * 1e6 + 0.5) / 1e6
    assert(boostB === expBoost)
    // normalized from 1e-6-banked raws
    val wA6 = math.floor(0.666667 * 1.0 * 1e6 + 0.5)
    val wB6 = math.floor(0.333333 * expBoost * 1e6 + 0.5)
    assert(wB === math.floor(wB6 / (wA6 + wB6) * 1e6 + 0.5) / 1e6)
    assert(wB > got("a")._5) // the hard source outweighs its token share
  }

  test("neymanAllocation: budget splits on n·sigma with largest-remainder, constant stratum gets zero") {
    val scored = Seq(
      ("a", 0.0), ("a", 1.0),   // sigma 0.5  → w3 = 1e7
      ("b", 0.5), ("b", 0.5),   // sigma 0    → w3 = 0
      ("c", 0.0), ("c", 0.5)    // sigma 0.25 → w3 = 5e6
    ).toDF("source", "q")
    val got = SampleOps.neymanAllocation(scored, "source", "q", total = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got("a") === ((2L, 0.5, 7L)))  // floor 6 + the largest remainder
    assert(got("b") === ((2L, 0.0, 0L)))  // no spread, no labels
    assert(got("c") === ((2L, 0.25, 3L)))
    assert(got.values.map(_._3).sum === 10L) // exact budget, any engine
  }

  test("dataFunnel: per-reason doc/token shares, docs missing from the token table count zero") {
    val curated = Seq((1L, "kept", true), (2L, "kept", true), (3L, "exact_dup", false),
      (4L, "low_quality", false)).toDF("doc_id", "reason", "keep")
    val toks = Seq((1L, 10L), (2L, 5L), (3L, 3L)).toDF("doc_id", "n_tokens") // 4L absent
    val got = SampleOps.dataFunnel(curated, toks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("kept") === ((2L, 15L, 0.5, 0.833333)))
    assert(got("exact_dup") === ((1L, 3L, 0.25, 0.166667)))
    assert(got("low_quality") === ((1L, 0L, 0.25, 0.0)))
  }
}

/** Driver-side replica of SampleOps.hashBucket for order assertions. */
object SampleOpsTestHash {
  def bucket(id: Long, m: Long = 1000000000L): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = md.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % m
  }
}
