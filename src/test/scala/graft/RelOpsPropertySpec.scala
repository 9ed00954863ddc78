package graft

import graft.ops.RelOps
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence tests for the relational extensions: many
  * generated cases folded into one DataFrame (case id inside the key)
  * so a single Spark job covers them all, checked against naive
  * in-memory reference implementations. Fixed seed — deterministic.
  */
class RelOpsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("asofJoin equals the naive latest-at-or-before lookup (60 random cases)") {
    val events = for {
      c <- 0 until 60
      _ <- 0 until rnd.nextInt(12)
    } yield (c, rnd.nextInt(100).toLong, rnd.nextInt(1000) / 10.0)
    // dedup to one value per (case, ts): asofJoin requires pre-deduped ties
    val dedup = events.groupBy(e => (e._1, e._2)).map(_._2.maxBy(_._3)).toSeq
    val probes = for { c <- 0 until 60; _ <- 0 until 5 } yield (c, rnd.nextInt(120).toLong)

    val out = RelOps.asofJoin(
      probes.toDF("case_id", "t"), dedup.toDF("case_id", "ts", "value"),
      Seq("case_id"), "t", "ts", "value")
      .as[(Int, Long, Option[Double])].collect()
      .map { case (c, t, v) => (c, t) -> v }.toMap

    val byCase = dedup.groupBy(_._1)
    probes.foreach { case (c, t) =>
      val expect = byCase.getOrElse(c, Seq.empty)
        .filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3)
      assert(out((c, t)) == expect, s"case=$c t=$t")
    }
  }

  test("overlapJoin equals the naive nested loop (40 random cases)") {
    val events = for {
      c <- 0 until 40
      i <- 0 until rnd.nextInt(10)
    } yield (c, rnd.nextInt(500).toLong, i)
    val intervals = for {
      c <- 0 until 40
      i <- 0 until rnd.nextInt(4)
      s = rnd.nextInt(450).toLong
    } yield (c, i, s, s + 1 + rnd.nextInt(200))

    val got = RelOps.overlapJoin(
      events.toDF("case_id", "t", "eid"),
      intervals.toDF("case_id", "iid", "s", "e")
        .withColumnRenamed("case_id", "case_id2"),
      "t", "s", "e", 64L)
      .filter($"case_id" === $"case_id2") // blocking is per-bucket; keep same-case pairs
      .select("case_id", "eid", "iid").as[(Int, Int, Int)].collect().toSet

    val expect = (for {
      (c, t, eid) <- events
      (c2, iid, s, e) <- intervals
      if c2 == c && t >= s && t < e
    } yield (c, eid, iid)).toSet
    assert(got == expect)
  }

  test("sessionize equals the naive gap-scan (50 random cases)") {
    val rows = for {
      c <- 0 until 50
      i <- 0 until rnd.nextInt(15)
    } yield (c, rnd.nextInt(1000).toLong, i)
    val gap = 50L

    val got = RelOps.sessionize(rows.toDF("case_id", "sec", "eid"),
        Seq("case_id"), "sec", gap, Seq("eid"))
      .select("case_id", "eid", "session_idx").as[(Int, Int, Int)].collect()
      .map { case (c, e, s) => (c, e) -> s }.toMap

    rows.groupBy(_._1).foreach { case (c, rs) =>
      var idx = 0
      var prev = Long.MinValue
      rs.sortBy(r => (r._2, r._3)).foreach { case (_, sec, eid) =>
        if (prev != Long.MinValue && sec - prev > gap) idx += 1
        assert(got((c, eid)) == idx, s"case=$c eid=$eid")
        prev = sec
      }
    }
  }
}
