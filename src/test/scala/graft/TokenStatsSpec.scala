package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden semantics of the one-pass token-stats walk behind
  * repetitionFrame: exact unigram/bigram counts, ratio arithmetic, and
  * the zero-row contract for null/empty/token-less text.
  */
class TokenStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def frame(rows: Seq[(Long, Option[String])]) =
    TextOps.repetitionFrame(rows.toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))

  test("distinct, top-token and duplicate-bigram ratios on hand-checked docs") {
    val got = frame(Seq(
      1L -> Some("a b a b a"),       // tokens a,b,a,b,a; bigrams ab,ba,ab,ba
      2L -> Some("one two three"),   // all distinct
      3L -> Some("x x x x")          // one token repeated
    ))
    // doc1: n=5 ndis=2 top=3 btot=4 bdis=2
    assert(got(0) === ((1L, 5L, 0.4, 0.6, 0.5)))
    // doc2: n=3 ndis=3 top=1 btot=2 bdis=2 → dup 0
    assert(got(1) === ((2L, 3L, 1.0, 1.0 / 3 match { case v => math.floor(v * 10000 + 0.5) / 10000 }, 0.0)))
    // doc3: n=4 ndis=1 top=4 btot=3 bdis=1 → dup 1 - 1/3
    assert(got(2) === ((3L, 4L, 0.25, 1.0, math.floor((1.0 - 1.0 / 3) * 10000 + 0.5) / 10000)))
  }

  test("null, empty and token-less text yield the all-zero row") {
    val got = frame(Seq(
      1L -> None,
      2L -> Some(""),
      3L -> Some("!!! ???"),  // no [a-z0-9_'] runs
      4L -> Some("solo")      // one token: no bigrams
    ))
    assert(got(0) === ((1L, 0L, 0.0, 0.0, 0.0)))
    assert(got(1) === ((2L, 0L, 0.0, 0.0, 0.0)))
    assert(got(2) === ((3L, 0L, 0.0, 0.0, 0.0)))
    assert(got(3) === ((4L, 1L, 1.0, 1.0, 0.0)))
  }

  test("walk matches the explode+aggregate reference on random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "y2")
    val docs = (1L to 60L).map { i =>
      i -> Some((0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val fast = TextOps.repetitionFrame(df)
    // reference: explode unigrams/bigrams relationally
    val base = df.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    val uni = base.select(col("doc_id"), explode(col("t")).as("u"))
      .groupBy("doc_id", "u").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n"), count(lit(1)).as("nd"), max("c").as("tp"))
    val big = base
      .select(col("doc_id"), col("t"), explode(sequence(lit(1), greatest(size(col("t")) - 1, lit(1)))).as("i"))
      .filter(col("i") < size(col("t")))
      .select(col("doc_id"),
        concat_ws(" ", element_at(col("t"), col("i")), element_at(col("t"), col("i") + 1)).as("b"))
      .groupBy("doc_id").agg(count(lit(1)).as("bt"), count_distinct(col("b")).as("bd"))
    val ref = df.select(col("doc_id"))
      .join(uni, Seq("doc_id"), "left").join(big, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_tokens"),
        coalesce(col("nd"), lit(0L)).as("nd"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("bt"), lit(0L)).as("bt"),
        coalesce(col("bd"), lit(0L)).as("bd"))
    val fastRows = fast.orderBy("doc_id").collect()
    val refRows = ref.orderBy("doc_id").collect()
    fastRows.zip(refRows).foreach { case (f, r) =>
      assert(f.getLong(1) === r.getLong(1), s"n_tokens doc ${f.getLong(0)}")
      val n = r.getLong(1).toDouble
      def rnd4(v: Double) = math.signum(v) * math.floor(math.abs(v) * 10000 + 0.5) / 10000
      if (n > 0) {
        assert(f.getDouble(2) === rnd4(r.getLong(2) / n), s"distinct_ratio doc ${f.getLong(0)}")
        assert(f.getDouble(3) === rnd4(r.getLong(3) / n), s"top_ratio doc ${f.getLong(0)}")
      }
      if (r.getLong(4) > 0)
        assert(f.getDouble(4) === rnd4(1.0 - r.getLong(5).toDouble / r.getLong(4)),
          s"dup_bigram doc ${f.getLong(0)}")
    }
  }
}
