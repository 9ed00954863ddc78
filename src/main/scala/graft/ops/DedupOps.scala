package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Rounding.round // binary rounding, DuckDB-consistent (shadows functions.round)

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
    widen(docs, heavy = false).select(TextOps.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Character k-shingles of the normalized text. `distinct = false`
    * skips the string dedup — correct for MinHash (the min over a
    * multiset equals the min over its set); keep `true` where set
    * semantics matter (Jaccard intersection/union sizes).
    *
    * PERF NOTE: higher-order functions are interpreted and re-evaluate
    * captured non-attribute expressions per element — `text` must be a
    * plain column (or cheap), never an expensive derived expression. The
    * hot paths below avoid this form entirely via [[explodedShingles]].
    */
  def shingles(text: Column, k: Int = 8, distinct: Boolean = true): Column = {
    val norm = TextOps.normalized(text)
    val arr = transform(sequence(lit(1), greatest(length(norm) - k + 1, lit(1))),
      i => norm.substr(i, lit(k)))
    val body = if (distinct) array_distinct(arr) else arr
    when(length(norm) < k, array(norm)).otherwise(body)
  }

  /** (id, shingle) rows: normalization materialized ONCE per document as
    * a real column, positions exploded, substr per row — everything stays
    * in whole-stage codegen and scales linearly. This is the shape every
    * shingle consumer should build on at 100 TB.
    */
  def explodedShingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val n = widen(docs).select(col(idCol).as("id"), TextOps.normalized(col(textCol)).as("norm"))
    n.select(col("id"), col("norm"),
        explode(sequence(lit(1), greatest(length(col("norm")) - (k - 1), lit(1)))).as("i"))
      .select(col("id"), col("norm").substr(col("i"), lit(k)).as("sh"))
  }

  /** Spread a narrow input (e.g. one small parquet file) across the
    * cluster before per-row heavy compute. A wide input (real datasets at
    * scale already have thousands of splits) passes through untouched —
    * no gratuitous shuffle.
    *
    * `heavy = true` (shingle/token explosion: compute amplified ~100×
    * per input byte) always spreads a narrow input. `heavy = false`
    * (one pass over each row) spreads only when the input is big enough
    * that single-threaded map work would dominate the repartition
    * shuffle — below that the shuffle costs more than it saves.
    */
  private[ops] def widen(df: DataFrame, heavy: Boolean = true): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (heavy) df.repartition(p)
    else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes > (32L << 20)) df.repartition(p) else df
    }
  }

  /** MinHash prime modulus and per-permutation universal-hash
    * coefficients `h_i(x) = (a_i * x + b_i) mod P` with P the first prime
    * above 2^32. One md5 per shingle yields the 32-bit base hash; the
    * permutations are then pure arithmetic — 16x less hashing than
    * seeded-digest-per-permutation, same LSH guarantees.
    */
  val MinHashP = 4294967311L
  def minHashCoeffs(i: Int): (Long, Long) = (2L * i + 1, 104729L * i + 12345L)

  /** 32-bit base hashes of each shingle (md5 hex prefix — engine-portable). */
  def shingleBaseHashes(shingleSet: Column): Column =
    transform(shingleSet, s => conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long"))

  /** MinHash signature from the base-hash array: minimum of each
    * universal-hash permutation. Map-only per row (no explode/shuffle).
    * Pass the MATERIALIZED base-hash column (one md5 pass), not a fresh
    * [[shingleBaseHashes]] per permutation.
    */
  def minHashSignature(baseHashes: Column, numHashes: Int = 16): Column =
    array((0 until numHashes).map { i =>
      val (a, b) = minHashCoeffs(i)
      array_min(transform(baseHashes, h => (h * a + b) % MinHashP))
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
    // explode → hash once per shingle → 16 mins in ONE partial-aggregated
    // pass: shuffle volume is n_docs × 16 longs regardless of text size.
    val hashed = explodedShingles(docs, idCol, textCol, 8)
      .select(col("id"),
        conv(substring(md5(col("sh").cast("binary")), 1, 8), 16, 10).cast("long").as("h"))
    val minAggs = (0 until numHashes).map { i =>
      val (a, b) = minHashCoeffs(i)
      min((col("h") * a + b) % MinHashP).as(s"m$i")
    }
    val sigs = hashed.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    val banded = sigs
      .select(col("id"), col("sig"), explode(bandKeys(col("sig"), bands, rows)).as("band"))
    val a = banded.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"))
    // join strategy stays AQE's choice: a broadcast build side does
    // re-execute the sig pipeline, but forcing shuffle_hash measured
    // slower overall (downstream q37 2.8s -> 4.1s at sf0.1) — and at
    // scale the banded side exceeds broadcast thresholds, where AQE
    // picks a shuffle join whose identical per-side subplans dedupe via
    // ReuseExchange anyway
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), (b => b)))
          / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= minhashSim) // filter before dedup: smaller distinct
      .distinct()
  }

  /** SimHash (16-bit): per-token hashes vote ±1 on each bit position;
    * the sign vector packs into one int. Near-dups have small Hamming
    * distance. Explode+aggregate form: scales as one shuffle keyed by id
    * with map-side partial aggregation.
    */
  def simHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
              bits: Int = 16): DataFrame = {
    val toks = widen(docs).select(col(idCol).as("id"),
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
    // gram sets are computed for the whole corpus in one linear
    // partial-aggregated pass and joined to the pairs; referencing
    // `pairs` only once keeps its (expensive) subplan from being
    // recomputed — measured faster than semi-join candidate pruning,
    // which triples the pairs subplan for a linear-cost saving
    val grams = explodedShingles(docs, idCol, textCol, n)
      .groupBy(col("id").as("jid"))
      .agg(collect_set(col("sh")).as("grams"))
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
    val a = emb.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col(vecCol).as("v_a"),
      SimilarityOps.norm(col(vecCol)).as("n_a"))
    val b = emb.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col(vecCol).as("v_b"),
      SimilarityOps.norm(col(vecCol)).as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(SimilarityOps.cosinePre(col("v_a"), col("v_b"), col("n_a"), col("n_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
