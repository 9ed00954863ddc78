package graft

import graft.ops.RelOps
import org.scalatest.funsuite.AnyFunSuite

/** As-of join, interval join and sessionization unit semantics:
  * inclusive-boundary matching, half-open ranges, gap thresholds.
  */
class RelOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("asofJoin: backward inclusive match, null when nothing precedes") {
    val right = Seq((1, 10L, 1.0), (1, 20L, 2.0), (2, 15L, 5.0))
      .toDF("k", "ts", "value")
    val left = Seq((1, 5L), (1, 10L), (1, 25L), (2, 14L), (3, 100L))
      .toDF("k", "t")
    val out = RelOps.asofJoin(left, right, Seq("k"), "t", "ts", "value")
      .as[(Int, Long, Option[Double])].collect().toSet
    assert(out == Set(
      (1, 5L, None),          // before first event
      (1, 10L, Some(1.0)),    // equal timestamp matches (inclusive)
      (1, 25L, Some(2.0)),    // latest preceding
      (2, 14L, None),         // other key's events invisible
      (3, 100L, None)         // key with no events at all
    ))
  }

  test("asofJoin: a latest event with NULL value wins the match and yields null") {
    val right = Seq((1, 10L, Some(5.0)), (1, 20L, None)).toDF("k", "ts", "value")
    val left = Seq((1, 25L)).toDF("k", "t")
    val out = RelOps.asofJoin(left, right, Seq("k"), "t", "ts", "value")
      .as[(Int, Long, Option[Double])].collect().toSet
    // ASOF LEFT JOIN semantics: the t=20 row matches; its null value is
    // the answer — NOT the older non-null 5.0 carried past it
    assert(out == Set((1, 25L, None)))
  }

  test("asofJoin forward: inclusive nearest-following match") {
    val right = Seq((1, 10L, 1.0), (1, 20L, 2.0), (2, 15L, 5.0))
      .toDF("k", "ts", "value")
    val left = Seq((1, 5L), (1, 10L), (1, 25L), (2, 16L))
      .toDF("k", "t")
    val out = RelOps.asofJoin(left, right, Seq("k"), "t", "ts", "value",
        direction = "forward")
      .as[(Int, Long, Option[Double])].collect().toSet
    assert(out == Set(
      (1, 5L, Some(1.0)),   // nearest following
      (1, 10L, Some(1.0)),  // equal timestamp matches (inclusive)
      (1, 25L, None),       // nothing follows
      (2, 16L, None)))      // other key's events invisible
  }

  test("asofJoin tolerance: matches farther than the tolerance become null") {
    val right = Seq((1, 10L, 1.0), (1, 100L, 2.0)).toDF("k", "ts", "value")
    val left = Seq((1, 12L), (1, 90L)).toDF("k", "t")
    val back = RelOps.asofJoin(left, right, Seq("k"), "t", "ts", "value",
        toleranceSeconds = 5L)
      .as[(Int, Long, Option[Double])].collect().toSet
    assert(back == Set((1, 12L, Some(1.0)), (1, 90L, None))) // 90-10=80 > 5
    val fwd = RelOps.asofJoin(left, right, Seq("k"), "t", "ts", "value",
        direction = "forward", toleranceSeconds = 15L)
      .as[(Int, Long, Option[Double])].collect().toSet
    assert(fwd == Set((1, 12L, None), (1, 90L, Some(2.0)))) // 100-12=88 > 15
  }

  test("overlapJoin: inverted/empty intervals match nothing (no bucket explosion)") {
    val ev = Seq((100L, "a")).toDF("t", "tag")
    val iv = Seq((1, 200L, 100L), (2, 100L, 100L), (3, 50L, 150L))
      .toDF("id", "s", "e")
    val out = RelOps.overlapJoin(ev, iv, "t", "s", "e", 10L)
      .select("tag", "id").as[(String, Int)].collect().toList
    assert(out == List(("a", 3)), "only the valid interval matches")
  }

  test("overlapJoin: half-open [start, end), exactly one match per true pair") {
    val ev = Seq((100L, "a"), (199L, "b"), (200L, "c"), (350L, "d"))
      .toDF("t", "tag")
    val iv = Seq((1, 100L, 200L), (2, 150L, 400L)).toDF("id", "s", "e")
    // bucketWidth smaller than the intervals → multi-bucket explode path
    val out = RelOps.overlapJoin(ev, iv, "t", "s", "e", 60L)
      .select("tag", "id").as[(String, Int)].collect().toList
    assert(out.sorted == List(("a", 1), ("b", 1), ("b", 2), ("c", 2), ("d", 2)).sorted)
    assert(out.size == out.distinct.size, "no duplicate pairs")
  }

  test("sessionize: gap strictly greater than threshold starts a new session") {
    val df = Seq(
      (1, 0L, 1), (1, 1800L, 2),  // gap == 1800 → same session
      (1, 3601L, 3),              // gap 1801 > 1800 → new session
      (2, 50L, 4)
    ).toDF("user_id", "sec", "event_id")
    val out = RelOps.sessionize(df, Seq("user_id"), "sec", 1800L, Seq("event_id"))
      .select("user_id", "event_id", "session_idx").as[(Int, Int, Int)].collect().toSet
    assert(out == Set((1, 1, 0), (1, 2, 0), (1, 3, 1), (2, 4, 0)))
  }

  test("saltedJoin equals the plain join on a 90%-skewed key, salts actually spread") {
    // hot key: 900 of 1000 left rows share key 1
    val left = (0 until 1000).map(i => (if (i < 900) 1 else i, i)).toDF("k", "row_id")
    val right = Seq((1, "hot"), (5, "cold"), (950, "cold2"), (99999, "unmatched"))
      .toDF("k", "tag")
    val plain = left.join(right, Seq("k"))
      .select("k", "row_id", "tag").as[(Int, Int, String)].collect().sorted.toList
    val salted = RelOps.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .select("k", "row_id", "tag").as[(Int, Int, String)].collect().sorted.toList
    assert(salted === plain)
    assert(plain.size === 901) // 900 hot-key matches + k=950
    // the hot key's rows really are sharded: count distinct shards used
    import org.apache.spark.sql.functions._
    val shards = left.filter(col("k") === 1)
      .withColumn("__shard", pmod(xxhash64(monotonically_increasing_id()), lit(8L)))
      .select(countDistinct(col("__shard"))).as[Long].head()
    assert(shards >= 6, s"expected the 900 hot rows across >=6 of 8 shards, got $shards")
  }

  test("saltedJoin idCols path: deterministic shard, equal to plain join, spread within hot key") {
    import org.apache.spark.sql.functions._
    val left = (0 until 1000).map(i => (if (i < 900) 1 else i, i)).toDF("k", "row_id")
    val right = Seq((1, "hot"), (5, "cold"), (950, "cold2"), (99999, "unmatched"))
      .toDF("k", "tag")
    val plain = left.join(right, Seq("k"))
      .select("k", "row_id", "tag").as[(Int, Int, String)].collect().sorted.toList
    val salted = RelOps.saltedJoin(left, right, Seq("k"), saltFactor = 8, idCols = Seq("row_id"))
      .select("k", "row_id", "tag").as[(Int, Int, String)].collect().sorted.toList
    assert(salted === plain)
    // content-hashed shard really spreads the 900 hot-key rows
    val shards = left.filter(col("k") === 1)
      .withColumn("__shard", pmod(xxhash64(col("k"), col("row_id")), lit(8L)))
      .select(countDistinct(col("__shard"))).as[Long].head()
    assert(shards >= 6, s"expected the hot rows across >=6 of 8 shards, got $shards")
    // and unlike the monotonic-id path it's replay-stable: same input → same shards
    val a = left.withColumn("__shard", pmod(xxhash64(col("k"), col("row_id")), lit(8L)))
      .select("row_id", "__shard").as[(Int, Long)].collect().toMap
    val b = left.withColumn("__shard", pmod(xxhash64(col("k"), col("row_id")), lit(8L)))
      .select("row_id", "__shard").as[(Int, Long)].collect().toMap
    assert(a === b)
  }

  test("windowFunnel: order, window, and earliest-chain semantics per user") {
    val ev = Seq(
      // u1: clean 3-step chain inside the window → level 3
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // u2: purchase falls outside the window → level 2
      (2L, "view", 0L), (2L, "click", 10L), (2L, "purchase", 10000L),
      // u3: steps present but in the wrong order → level 1
      (3L, "purchase", 0L), (3L, "click", 5L), (3L, "view", 10L),
      // u4: no step-1 event at all → absent from the output
      (4L, "click", 0L), (4L, "purchase", 10L),
      // u5: click beyond the window kills the chain even though a
      // purchase follows → level 1
      (5L, "view", 0L), (5L, "click", 4000L), (5L, "purchase", 4100L),
      // u6: EARLIEST chain pins m1 to the first view (0), so the
      // boundary click at 3600 still fits (m2 − m1 = window, inclusive)
      (6L, "view", 0L), (6L, "view", 3500L), (6L, "click", 3600L))
      .toDF("user_id", "event_type", "sec")
    val got = RelOps.windowFunnel(ev, Seq("view", "click", "purchase"), 3600L)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1, 5L -> 1, 6L -> 2))
  }

  test("cohortRetention: first-week cohorts, offset cells, rates against own cohort size") {
    val wk = 604800L
    val ev = Seq(
      // cohort week 0: u1 (weeks 0,1,3 — week 1 twice, dedup holds), u2 (weeks 0,2)
      (1L, 0L), (1L, wk + 5L), (1L, wk + 9L), (1L, 3 * wk + 1L),
      (2L, 10L), (2L, 2 * wk),
      // cohort week 1: u3 only
      (3L, wk + 100L))
      .toDF("user_id", "sec")
    val got = RelOps.cohortRetention(ev)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 1.0)), (0L, 1L) -> ((1L, 0.5)),
      (0L, 2L) -> ((1L, 0.5)), (0L, 3L) -> ((1L, 0.5)),
      (1L, 0L) -> ((1L, 1.0))))
  }

  test("funnelReport: entered/converted counts, exact interpolated time-to-convert percentiles") {
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 5L), (1L, "purchase", 20L),   // converts in 20 s
      (2L, "view", 0L), (2L, "click", 50L), (2L, "purchase", 100L), // converts in 100 s
      (3L, "view", 0L))                                             // enters, never converts
      .toDF("user_id", "event_type", "sec")
    val r = RelOps.funnelReport(ev, Seq("view", "click", "purchase"), 3600L).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((3L, 2L, 0.6667)))
    assert(r.getDouble(3) === 60.0) // interp of {20, 100} at 0.5
    assert(r.getDouble(4) === 92.0) // 20 + 0.9·80
  }

  test("madOutliers: MAD ignores the outlier it flags; zero-MAD group flags any deviation") {
    val ev = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 100.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0), ("b", 5.0))
      .toDF("event_type", "value")
    val got = RelOps.madOutliers(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // a: median 1, MAD 0 → the 100 deviates > 0 and is flagged
    assert(got("a") === ((5L, 1.0, 0.0, 1L)))
    // b: median 3, MAD 1, max dev 2 ≤ 3·1 → clean
    assert(got("b") === ((5L, 3.0, 1.0, 0L)))
  }

  test("hourlyProfile: uniform type scores chi2 ~0, single-hour type scores N·23; peak ties to earliest hour") {
    val ev = (0 until 24).map(h => ("x", h * 3600L)) ++
      (0 until 10).map(k => ("y", 5 * 3600L + k))
    val got = RelOps.hourlyProfile(ev.toDF("event_type", "sec")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("x") === ((24L, 0, 0.0417, 0.0))) // perfectly uniform; all-tie peak → hour 0
    // all mass in one cell: chi2 = N·(24−1) = 230 (micro-banked: 230.0)
    assert(got("y") === ((10L, 5, 1.0, 230.0)))
  }

  test("rollingActive: trailing window, report days clamped to observed days, dedup within window") {
    val day = 86400L
    val ev = Seq(
      (1L, 0L), (1L, 10L),      // u1 day 0 (twice — dedup)
      (1L, 3 * day), (2L, 5L),  // u1 day 3, u2 day 0
      (3L, 20 * day))           // u3 day 20, isolated
      .toDF("user_id", "sec")
    val got7 = RelOps.rollingActive(ev).as[(Long, Long)].collect().toMap
    // day 3 sees u1 (days 0 AND 3 — still one) and u2 (day 0, within 7)
    assert(got7 === Map(0L -> 2L, 3L -> 2L, 20L -> 1L))
    val got2 = RelOps.rollingActive(ev, windowDays = 2).as[(Long, Long)].collect().toMap
    // 2-day window: day 3 only sees u1's own day-3 activity
    assert(got2 === Map(0L -> 2L, 3L -> 1L, 20L -> 1L))
  }

  /** Build one event row per (user, count), the LAST exactly at
    * `day`·86400 so day differences stay whole multiples.
    */
  private def rfmEvents(users: Seq[(Long, Long, Int)]) =
    users.flatMap { case (u, day, f) =>
      (0 until f).map(i => (u, day * 86400L - i, 100.0))
    }.toDF("user_id", "sec", "value")

  test("rfmSegments: distinct R/F/M ladder maps to hand-computed quintiles and labels") {
    // days_since: u1/u5 → 0 (tied, competition rank 1), u2 → 1, u3 → 8, u4 → 9
    val got = RelOps.rfmSegments(
      rfmEvents(Seq((1L, 10L, 5), (2L, 9L, 4), (3L, 2L, 3), (4L, 1L, 2), (5L, 10L, 1))))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getString(7)))).toMap
    assert(got(1L) === ((0L, 5L, 500.0, 1, 1, 1, "champion")))
    assert(got(5L) === ((0L, 1L, 100.0, 1, 5, 5, "new"))) // recent but one-shot
    assert(got(2L) === ((1L, 4L, 400.0, 3, 2, 2, "regular"))) // rank 3 of 5 → r_q 3
    assert(got(4L)._7 === "regular") // (5, 4, 4): stale but f_q 4 is not > 4
  }

  test("rfmSegments: 10-user ladder yields at_risk and hibernating tails") {
    // days ladder u1 best..u10 worst → r_q = ceil(rank/2); u9 is frequent
    // but stale (at_risk), u10 stale AND rare (hibernating)
    val users = Seq(
      (1L, 9L, 9), (2L, 8L, 8), (3L, 7L, 7), (4L, 6L, 6), (5L, 5L, 5),
      (6L, 4L, 4), (7L, 3L, 3), (8L, 2L, 2), (9L, 1L, 10), (10L, 0L, 1))
    val got = RelOps.rfmSegments(rfmEvents(users)).collect()
      .map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5), r.getString(7)))).toMap
    assert(got(9L) === ((5, 1, "at_risk")))
    assert(got(10L) === ((5, 5, "hibernating")))
    assert(got(1L) === ((1, 1, "champion")))
  }
}
