package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Dev aid: repeated timing of named `SparkEntry.queries` entries (or the
  * built-in stage breakdowns below) to separate plan-shape effects from
  * run-to-run noise. `runMain graft.Profile <name> [reps]` prints
  * per-repetition seconds and the min.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

    // stage breakdowns for the dedup pipeline, beyond SparkEntry entries
    // q185 PPJoin stage breakdown (uncheckpointed replicas of the
    // operator's internal frames — raw stage costs, no reuse)
    def ppTk: DataFrame = docs.filter(col("doc_id") < 500 && col("text").isNotNull)
      .select(col("doc_id").as("id"), graft.ops.TextOps.normalized(col("text")).as("norm"))
      .select(col("id"), explode(expr(
        "CASE WHEN length(norm) < 8 THEN array(norm) " +
          "ELSE array_distinct(transform(sequence(1, length(norm) - 7), " +
          "i -> substring(norm, i, 8))) END")).as("tok"))
    def ppPre: DataFrame = {
      val dfq = ppTk.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy(col("df"), col("tok"))
      val wn = org.apache.spark.sql.expressions.Window.partitionBy("id")
      ppTk.join(dfq, Seq("tok"))
        .select(col("id"), col("tok"),
          row_number().over(w).as("rn"), count(lit(1)).over(wn).as("n"))
        .filter(col("rn") <= expr("n - ((3 * n + 4) div 5) + 1"))
    }
    val extra: Map[String, () => DataFrame] = Map(
      "pp_tk" -> (() => ppTk.groupBy().count()),
      "pp_dfq" -> (() => ppTk.groupBy("tok").agg(count(lit(1)).as("df")).groupBy().count()),
      "pp_pre" -> (() => ppPre.groupBy().count()),
      "pp_cand" -> (() => {
        val pre = ppPre
        pre.select(col("tok"), col("id").as("id_a"), col("n").as("__na"))
          .join(pre.select(col("tok"), col("id").as("id_b"), col("n").as("__nb")), Seq("tok"))
          .filter(col("id_a") < col("id_b")
            && col("__na") * 3 <= col("__nb") * 5 && col("__nb") * 3 <= col("__na") * 5)
          .select("id_a", "id_b").distinct().groupBy().count()
      }),
      "pp_ts" -> (() => ppTk.groupBy("id")
        .agg(sort_array(collect_set(col("tok"))).as("tl")).groupBy().count()),
      "candidates" -> (() => DedupOps.minHashCandidates(docs)),
      "jaccard_pruned" -> (() => DedupOps.jaccardVerify(DedupOps.minHashCandidates(docs), docs)),
      "jaccard_forced" -> (() => DedupOps.jaccardVerify(DedupOps.minHashCandidates(docs), docs)
        .filter(col("jaccard") >= -1.0)),
      "grams_only" -> (() => DedupOps.explodedShingles(docs, "doc_id", "text", 3)
        .groupBy(col("id")).agg(collect_set(col("sh")).as("grams"))
        .select(sum(size(col("grams"))).as("s"))),
      // q100 with refinement gated off: times the skew construction +
      // flat auto-k pass + pair join alone, so (q100 - this) isolates
      // the joint sub-Lloyd + refined-assignment cost
      "q100_norefine" -> (() => {
        val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .filter(col("embedding").isNotNull)
        val anchors = base.filter(col("vec_id") < 4)
          .select(col("vec_id").as("aid"), col("embedding").as("avec"))
        val skewed = base
          .withColumn("aid", when(col("vec_id") % 10 < 7, col("vec_id") % 4))
          .join(broadcast(anchors), Seq("aid"), "left")
          .select(col("vec_id"),
            when(col("avec").isNotNull,
              concat(
                array((element_at(col("avec"), 1).cast("double")
                  + (col("vec_id") % 97).cast("double") / 1000.0).cast("float")),
                slice(col("avec"), 2, 63)))
              .otherwise(col("embedding")).as("embedding"))
        graft.ops.SimilarityOps.semDedupAdaptive(skewed, targetCellRows = 32,
          oversizeFactor = 1000000)
      }),
      // q202 composite stage breakdown: each entry times ONE stage of
      // the corpus build in isolation (stages re-derive their inputs,
      // so cb_mixture ⊃ cb_adm ⊃ cb_curation+cb_decon — subtract to
      // isolate a stage; the composite entry itself prices the
      // checkpointed chain)
      "cb_curation" -> (() => OpsEntries.curationFrame(docs)),
      "cb_decon" -> (() => OpsEntries.deconFrame(docs)),
      "cb_adm" -> (() => OpsEntries.admissionFrame(docs)),
      "cb_pipeline" -> (() => SparkEntry.queries("q202_corpus_build")(spark, sfDir))
    )

    args.take(1).foreach { name =>
      val build: () => DataFrame = extra.getOrElse(name,
        () => SparkEntry.queries(name)(spark, sfDir))
      val times = (0 until reps).map { i =>
        val t0 = System.nanoTime()
        // toRdd: evaluate ALL output columns (count() would let Catalyst
        // prune the projected work this harness exists to measure)
        build().queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"  rep$i: $dt%.3f s")
        dt
      }
      println(f"$name min=${times.min}%.3f s over $reps reps")
    }
    spark.stop()
  }
}
