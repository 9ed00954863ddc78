package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groupBy), MinHash+LSH banding, SimHash,
  * n-gram Jaccard verification, embedding-cosine near-dup.
  *
  * Scale design: signature computation is map-only per-row expression
  * work (no UDFs — everything stays in codegen); candidate generation
  * shuffles once on the band/bucket key (tiny keys, combiner-friendly);
  * only candidate PAIRS (a vanishing fraction of n²) reach the
  * verification join. This is the standard shape that survives 100 TB:
  * no all-pairs product ever materializes.
  */
object DedupOps {

  /** Exact dedup on the normalized-content fingerprint: one row per
    * distinct content, keeping the smallest id; `dup_count` reports
    * group size. Single hash aggregate.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(TextOps.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Character k-shingle set of the normalized text (distinct). */
  def shingles(text: Column, k: Int = 8): Column = {
    val norm = TextOps.normalized(text)
    when(length(norm) < k, array(norm)).otherwise(
      array_distinct(transform(sequence(lit(1), length(norm) - k + 1),
        i => norm.substr(i, lit(k)))))
  }

  /** MinHash signature: `numHashes` permutations simulated by seeded
    * md5; each signature is the minimum digest over the shingle set.
    * Map-only per row (array transform, no explode/shuffle).
    */
  def minHashSignature(shingleSet: Column, numHashes: Int = 16): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleSet, s => md5(concat(lit(seed.toString), lit(":"), s).cast("binary"))))
    }: _*)

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`,
    * each hashed to one bucket key. Docs sharing ANY band key are candidates.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val sl = slice(signature, b * rowsPerBand + 1, rowsPerBand)
      concat_ws("|", lit(b.toString) +: (0 until rowsPerBand).map(r => element_at(sl, r + 1)): _*)
    }: _*)

  /** MinHash-LSH candidate pairs: explode band keys, self-join within
    * buckets (the only shuffle — on short band-key strings), emit each
    * pair once (a < b) with the estimated Jaccard = matching signature
    * fraction. `minhashSim` filters the estimate.
    */
  def minHashCandidates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                        numHashes: Int = 16, bands: Int = 4, minhashSim: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigs = docs.select(
      col(idCol).as("id"),
      minHashSignature(shingles(col(textCol)), numHashes).as("sig")
    )
    val banded = sigs.select(col("id"), col("sig"), explode(bandKeys(col("sig"), bands, rows)).as("band"))
    val a = banded.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), (b => b)))
          / lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minhashSim)
  }

  /** SimHash (16-bit): per-token hashes vote ±1 on each bit position;
    * the sign vector packs into one int. Near-dups have small Hamming
    * distance. Explode+aggregate form: scales as one shuffle keyed by id
    * with map-side partial aggregation.
    */
  def simHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
              bits: Int = 16): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
    // 32-bit token hash from the md5 hex prefix (engine-portable).
    val hashed = toks.select(col("id"),
      conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10).cast("long").as("h"))
    val votes = (0 until bits).map { k =>
      sum(shiftright(col("h"), k).bitwiseAND(1) * 2 - 1).as(s"b$k")
    }
    val voted = hashed.groupBy("id").agg(votes.head, votes.tail: _*)
    val packed = (0 until bits).map { k =>
      when(col(s"b$k") > 0, lit(1L << k)).otherwise(0L)
    }.reduce(_ + _)
    voted.select(col("id"), packed.as("simhash"))
  }

  /** Hamming distance between two packed simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard verification for candidate pairs: exact similarity
    * on character n-gram sets. `pairs` must carry id_a/id_b; docs are
    * joined back (broadcast when small) to fetch the texts.
    */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol).as("jid"), shingles(col(textCol), n).as("grams"))
    pairs
      .join(grams.withColumnRenamed("jid", "id_a").withColumnRenamed("grams", "grams_a"), Seq("id_a"))
      .join(grams.withColumnRenamed("jid", "id_b").withColumnRenamed("grams", "grams_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("grams_a"), col("grams_b"))).cast("double"))
      .select(col("id_a"), col("id_b"),
        round(when(col("uni") > 0, col("inter") / col("uni")).otherwise(0.0), 4).as("jaccard"))
  }

  /** Embedding near-dup: pairs with cosine similarity above `threshold`.
    * Blocked on `blockCol` (e.g. a cluster label or LSH bucket) so the
    * join is bucket-local — the all-pairs product never materializes.
    */
  def embeddingNearDup(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
                       blockCol: String = "label", threshold: Double = 0.95): DataFrame = {
    val a = emb.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(SimilarityOps.cosine(col("v_a"), col("v_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
