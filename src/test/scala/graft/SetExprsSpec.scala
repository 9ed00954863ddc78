package graft

import graft.functions.SetExprs
import graft.ops.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the sorted-intersect-size native expression and the
  * base-38 gram coding it relies on: parity with the composable
  * `size(array_intersect(...))` form on sorted-distinct inputs, null
  * handling, and bijectivity of the code on the normalized alphabet.
  */
class SetExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("sorted_intersect_size matches size(array_intersect) on sorted-distinct arrays") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val a = rnd.shuffle((0L until 50L).toList).take(rnd.nextInt(20)).distinct.sorted
      val b = rnd.shuffle((0L until 50L).toList).take(rnd.nextInt(20)).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", SetExprs.sortedIntersectSize(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((Seq(1L, 3L, 5L), Seq(2L, 3L, 5L, 9L))).toDF("a", "b")
    // project (codegen) vs filter-pushdown-free eval: compare via collect
    val fast = df.select(SetExprs.sortedIntersectSize(col("a"), col("b"))).as[Int].head()
    assert(fast === 2)
  }

  test("null array yields null; empty arrays yield 0") {
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L)))
    ).toDF("a", "b").select(SetExprs.sortedIntersectSize(col("a"), col("b")).as("s"))
    val got = df.as[Option[Int]].collect().toSeq
    assert(got === Seq(None, Some(0)))
  }

  test("gramCode is injective across normalized grams incl. short-document grams") {
    // all distinct strings over the alphabet with length <= 3 must code distinctly
    val alpha = (' ' +: ('a' to 'z') ++: ('0' to '9')).map(_.toString)
    val grams = (alpha.flatMap(a => alpha.flatMap(b => alpha.map(a + b + _))) ++
      alpha.flatMap(a => alpha.map(a + _)) ++ alpha :+ "").distinct
    val df = grams.toDF("sh").select(col("sh"), DedupOps.gramCode(col("sh"), 3).as("c"))
    assert(df.select("c").distinct().count() === grams.size)
  }

  test("coded jaccardVerify equals string-set jaccard on sample docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog!"),
      (3L, "Entirely different content 123 here."),
      (4L, "ab"), // short doc: single sub-n gram
      (5L, "ab")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (2L, 4L)).toDF("id_a", "id_b")
    val got = DedupOps.jaccardVerify(pairs, docs)
      .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
    // string-set reference computed with Spark built-ins
    val grams = docs.select(col("doc_id"), DedupOps.shingles(col("text"), 3).as("g"))
    val ref = pairs
      .join(grams.select(col("doc_id").as("id_a"), col("g").as("ga")), Seq("id_a"))
      .join(grams.select(col("doc_id").as("id_b"), col("g").as("gb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.ops.Rounding.round(
          size(array_intersect(col("ga"), col("gb"))).cast("double") /
            size(array_union(col("ga"), col("gb"))).cast("double"), 4).as("j"))
      .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
    assert(got === ref)
    assert(got.find(t => t._1 == 4L && t._2 == 5L).get._3 === 1.0)
  }
}
