package graft

import graft.ops.{DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the retrieval / classification / reporting family:
  * hand-checked BM25 scores, kNN majority votes and ties, Naive Bayes
  * posteriors, soft-dedup weights, data-card rollups and RRF fusion.
  */
class RetrievalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bm25TopK: hand-checked score, tf saturation ranks, non-matching doc absent") {
    // N=3, df(cat)=2 → idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    // dl: d1=2, d2=3, d3=1 → avgdl=2.0
    // d1 (tf=1): 1·2.2/(1+1.2·(0.25+0.75·2/2)) = 2.2/2.2 = 1 → ln(1.6)
    // d2 (tf=3): 6.6/(3+1.2·1.375) = 6.6/4.65 ≈ 1.41935 → bigger
    val docs = Seq((1L, "cat dog"), (2L, "cat cat cat"), (3L, "bird"))
      .toDF("doc_id", "text")
    val qt = Seq((0, "cat")).toDF("query_id", "term")
    val got = TextOps.bm25TopK(docs, qt).orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(2L, 1L)) // doc3 never matches
    val d1 = got.find(_.getLong(1) == 1L).get
    assert(d1.getDouble(2) === 0.47) // round(round(ln(1.6),6)·1, 4)
    assert(got.map(_.getInt(4)).toSeq === Seq(1, 2))
  }

  test("knnClassify: majority vote wins, vote tie breaks to the smaller label") {
    // query 0 at [1,0]; 2 close label-1 neighbors, 1 close label-2 → pred 1
    // query 1 at [0,1]; k=2 sees one of each label (3,4) → tie → smaller (3)
    val rows = Seq(
      (0L, Array(1f, 0f), 9), (10L, Array(0.9f, 0.1f), 1), (11L, Array(0.95f, 0.05f), 1),
      (12L, Array(0.8f, 0.2f), 2),
      (1L, Array(0f, 1f), 9), (20L, Array(0.1f, 0.9f), 4), (21L, Array(0.05f, 0.95f), 3))
      .toDF("vec_id", "embedding", "label")
    val q0 = SimilarityOps.knnClassify(rows.filter(col("vec_id") === 0), rows, k = 3)
      .collect().head
    assert(q0.getInt(2) === 1 && q0.getLong(3) === 2L && !q0.getBoolean(4))
    val q1 = SimilarityOps.knnClassify(rows.filter(col("vec_id") === 1), rows, k = 2)
      .collect().head
    assert(q1.getInt(2) === 3 && q1.getLong(3) === 1L)
  }

  test("nbLangClassify: smoothed posteriors pick the class that saw the token") {
    // train: en={aa,bb}, fr={cc}; V=3. test doc 0 = "aa":
    // en: ln(1/2) + ln((1+1)/(2+3)); fr: ln(1/2) + ln((0+1)/(1+3)) → en
    val docs = Seq((0L, "aa", "en"), (1L, "aa bb", "en"), (2L, "cc", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.nbLangClassify(docs).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === 0L && r.getString(2) === "en" && r.getBoolean(4))
    assert(r.getDouble(3) === -1.6094) // round(ln(0.5)+ln(0.4), 4)
  }

  test("softDedupWeights: group mass sums to one per distinct content, null text is a singleton") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, null))
      .toDF("doc_id", "text")
    val got = DedupOps.softDedupWeights(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((2L, 0.5)) && got(2L) === ((2L, 0.5)))
    assert(got(3L) === ((1L, 1.0)) && got(4L) === ((1L, 1.0)))
  }

  test("dataCard: per-group counts, dup rate and token mass; null text costs no tokens") {
    val docs = Seq(
      (1L, "cat dog", "a", "en"), (2L, "cat dog", "a", "en"), (3L, "bird", "a", "en"),
      (4L, null, "b", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val got = TextOps.dataCard(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val a = got(("a", "en"))
    assert(a.getLong(2) === 3L && a.getLong(3) === 5L) // 2+2+1 tokens
    assert(a.getDouble(7) === 0.3333)                  // 1 - 2/3
    val b = got(("b", "en"))
    assert(b.getLong(2) === 1L && b.getLong(3) === 0L && b.getDouble(7) === 0.0)
  }

  test("rrfFuse: both-list hits outrank single-list hits, per-list rank feeds 1/(c+r)") {
    val a = Seq((0L, 101L, 1), (0L, 102L, 2)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((0L, 102L, 1), (0L, 103L, 2)).toDF("query_id", "neighbor_id", "rank")
    val got = SimilarityOps.rrfFuse(Seq(a, b)).orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(102L, 101L, 103L))
    assert(got.map(_.getLong(3)).toSeq === Seq(2L, 1L, 1L))
    // 102: round(1/61,6)+round(1/62,6) = 0.016393+0.016129
    assert(got.head.getDouble(2) === 0.032522)
  }
}
