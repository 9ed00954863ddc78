package graft

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the tokenizer-training and decontamination
  * operators: hand-checked BPE pair weights; contamination rates for
  * identical, partially-overlapping and disjoint documents.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bpeMergePairs weights adjacent char pairs by word frequency") {
    // corpus: "low low lower" → words: low x2, lower x1
    // pairs: lo(2+1)=3, ow(2+1)=3, we(1), er(1)
    val docs = Seq((1L, "low low"), (2L, "lower")).toDF("doc_id", "text")
    val got = TextOps.bpeMergePairs(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("lo" -> 3L, "ow" -> 3L, "we" -> 1L, "er" -> 1L))
  }

  test("bpeMergePairs ignores single-char words and respects topK with tie-break") {
    val docs = Seq((1L, "a a a ab ba")).toDF("doc_id", "text")
    val got = TextOps.bpeMergePairs(docs, topK = 1).collect()
    // pairs: ab(1), ba(1) — tie broken by pair asc → "ab"
    assert(got.length === 1 && got(0).getString(0) === "ab" && got(0).getLong(1) === 1L)
  }

  test("evalGramOverlap: identical doc fully contaminated, disjoint doc clean") {
    val evalDocs = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // identical → rate 1.0
      (2L, "zzz yyy xxx www vvv uuu completely different"),  // disjoint → 0.0
      (3L, "the quick brown fox went home early today ok")   // partial overlap
    ).toDF("doc_id", "text")
    val got = DedupOps.evalGramOverlap(train, evalDocs).orderBy("doc_id").collect()
    assert(got(0).getDouble(3) === 1.0 && got(0).getBoolean(4))
    assert(got(1).getLong(2) === 0L && got(1).getDouble(3) === 0.0 && !got(1).getBoolean(4))
    val partial = got(2)
    assert(partial.getLong(2) > 0 && partial.getDouble(3) > 0.0 && partial.getDouble(3) < 1.0)
    // hit grams can never exceed the doc's gram count
    got.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("evalGramOverlap counts distinct gram hits (repeats in eval don't double-count)") {
    // eval contains the same gram content twice under two ids
    val evalDocs = Seq((100L, "abcdefgh"), (101L, "abcdefgh")).toDF("doc_id", "text")
    val train = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val got = DedupOps.evalGramOverlap(train, evalDocs).collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 1L && got(0).getLong(2) === 1L) // one 8-gram, one hit
  }
}
