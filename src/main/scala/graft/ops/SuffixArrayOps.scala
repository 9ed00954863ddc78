package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed generalized suffix-array construction by prefix doubling
  * — the corpus-scale form of what [[TextOps.suffixArraySpans]] does in
  * one task (that form's scaladoc names this algorithm as the sharded
  * alternative; this is it).
  *
  * Token-wise suffixes of every document, globally sorted, with NO
  * single-task sort of the suffix set and NO task ever holding more
  * than its partition of (doc_id, position, rank) triples:
  *
  *  - Each document's token array gets a per-doc sentinel appended
  *    (\u0001 + zero-padded doc_id: sorts below every real token, and
  *    between docs in doc_id order), so no suffix is a prefix of
  *    another and the final order is a total order equal to
  *    (suffix content, doc_id, position) — the order a DuckDB
  *    `ORDER BY toks[p:], doc_id, p` replay produces, since list
  *    comparison is lexicographic with shorter-prefix-first.
  *  - Round 0 ranks positions by their single token; round k doubles
  *    the compared prefix by pairing rank(p) with rank(p + 2^(k-1))
  *    within the same document (suffixes never compare past their
  *    sentinel, so positions past the doc end can take rank −1: any
  *    suffix short enough to run out is already uniquely ranked by the
  *    window that contains its sentinel).
  *  - Ranking a round = one global range-partitioned sort on the pair
  *    (Spark's distributed orderBy), a per-partition ordinal via
  *    `zipWithIndex` (one count job for partition offsets — no
  *    single-partition window), and min-ordinal-per-group to keep ties
  *    tied. Order-preserving, so the doubling invariant holds.
  *
  * Rounds = ceil(log2(longest doc + 1)) — document length, NOT corpus
  * length, bounds the doubling (suffixes are doc-local), so 100-TB
  * corpora of bounded-length documents converge in ~10–12 rounds of
  * linear shuffles. Each round's frame is `localCheckpoint(true)` so
  * lineage stays flat (the [[TextOps.bpeTrain]] discipline).
  *
  * Output: (rank, doc_id, pos) — rank 0..S−1 over all real (non-
  * sentinel) suffixes, S = total token count of the corpus slice.
  */
object SuffixArrayOps {

  /** Order-preserving distributed rank: global sort by `keyCols`, then
    * every row gets the GLOBAL ordinal of the first row of its key
    * group (ties collapse to the group start — the order-preserving
    * rank prefix doubling needs). Returns the input columns plus
    * `rank`.
    *
    * The sort is the round's ONLY shuffle. Tie-collapsing runs as two
    * light passes over the sorted partitions: pass 1 collects one
    * 4-tuple per partition (row count, first key, last key, local
    * index where the last group starts); the driver folds those into a
    * per-partition (offset, carry key, carry rank) — the group open at
    * each partition boundary and the global ordinal where it started,
    * correct even when one group spans MANY whole partitions (the
    * carry only advances when a partition starts a new group); pass 2
    * assigns ranks partition-locally from the carry. Replaces the
    * naive min-ordinal groupBy + join-back, which cost two more
    * corpus-sized shuffles per doubling round.
    */
  private def rankBy(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(keyCols.map(col): _*)
    val schema = sorted.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    def keyOf(r: Row): Seq[Any] = keyIdx.map(r.get)
    val rdd = sorted.rdd
    // pass 1: (count, firstKey, lastKey, local start index of the last
    // group) per partition — one row of driver state per partition
    val stats = rdd.mapPartitionsWithIndex { (p, it) =>
      var count = 0L
      var firstKey: Seq[Any] = null
      var lastKey: Seq[Any] = null
      var lastStart = 0L
      while (it.hasNext) {
        val k = keyOf(it.next())
        if (count == 0L) firstKey = k
        else if (k != lastKey) lastStart = count
        lastKey = k
        count += 1
      }
      Iterator.single((p, (count, firstKey, lastKey, lastStart)))
    }.collect().toMap
    val nParts = rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    val carryKeys = new Array[Seq[Any]](nParts)
    val carryRanks = new Array[Long](nParts)
    var off = 0L
    var openKey: Seq[Any] = null
    var openRank = 0L
    (0 until nParts).foreach { p =>
      offsets(p) = off
      carryKeys(p) = openKey
      carryRanks(p) = openRank
      val (count, firstKey, lastKey, lastStart) = stats(p)
      if (count > 0L) {
        // the group open at the END of p: continues the incoming carry
        // only if the whole partition is one group that matches it
        if (!(firstKey == openKey && lastStart == 0L) || openKey == null) {
          openRank = off + lastStart
        }
        openKey = lastKey
        off += count
      }
    }
    val bcOff = spark.sparkContext.broadcast((offsets, carryKeys, carryRanks))
    val ranked = rdd.mapPartitionsWithIndex { (p, it) =>
      val (offs, cks, crs) = bcOff.value
      var i = 0L
      var prevKey: Seq[Any] = null
      var groupStart = 0L
      it.map { row =>
        val k = keyOf(row)
        if (i == 0L) groupStart = if (k == cks(p)) crs(p) else offs(p)
        else if (k != prevKey) groupStart = offs(p) + i
        prevKey = k
        i += 1
        Row.fromSeq(row.toSeq :+ groupStart)
      }
    }
    spark.createDataFrame(ranked, schema.add("rank", LongType))
  }

  /** Per-doc token arrays with the sentinel appended: (did, tk, n_real)
    * where tk has size n_real + 1. Null-text docs are dropped. */
  private[ops] def sentineled(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("did"), TextOps.tokens(col(textCol)).as("tk"))
      .select(col("did"),
        concat(col("tk"),
          array(concat(lit("\u0001"), lpad(col("did").cast("string"), 12, "0")))).as("tk"),
        size(col("tk")).as("n_real"))

  /** The generalized suffix array. `maxRounds` is a safety bound only —
    * construction stops at ceil(log2(longest doc + 1)) rounds.
    *
    * Returns (rank, doc_id, pos): rank is dense 0..S−1 in suffix order
    * (sentinel-only suffixes excluded — they occupy the first D global
    * ranks by construction, so the real ranks re-base by subtracting D).
    */
  def suffixArray(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                  maxRounds: Int = 32): DataFrame = {
    val toks = sentineled(docs, idCol, textCol)
    // longest sentineled doc bounds the doubling; doc count re-bases ranks
    val (maxLen, nDocs) = {
      val r = toks.agg(max(size(col("tk"))), count(lit(1))).head()
      (Option(r.get(0)).map(_.asInstanceOf[Int]).getOrElse(0), r.getLong(1))
    }
    val posed = toks.select(col("did"), col("n_real"),
        posexplode(col("tk")).as(Seq("p", "tok")))
      .select(col("did"), col("p").cast("long").as("p"), col("tok"), col("n_real"))
    var cur = rankBy(posed, Seq("tok"))
      .select(col("did"), col("p"), col("n_real"), col("rank"))
      .localCheckpoint(true)
    var k = 1L
    var rounds = 0
    var settled = false
    while (!settled && k < maxLen && rounds < maxRounds) {
      val shifted = cur.select(col("did"), (col("p") - k).as("p"), col("rank").as("_r2"))
      val paired = cur.withColumnRenamed("rank", "_r1")
        .join(shifted, Seq("did", "p"), "left")
        .withColumn("_r2", coalesce(col("_r2"), lit(-1L)))
      cur = rankBy(paired, Seq("_r1", "_r2"))
        .select(col("did"), col("p"), col("n_real"), col("rank"))
        .localCheckpoint(true)
      k *= 2
      rounds += 1
      // r15 early exit (guide §1.2 step 1 — don't run passes whose
      // output is already final): once every rank is UNIQUE the order
      // is total, and each further doubling ranks by (_r1, _r2) pairs
      // whose first components are already all-distinct — the identity.
      // Natural text diverges in a few tokens, so this typically halves
      // the log2(maxLen) round count; the check is one bounded
      // aggregate on the just-checkpointed frame vs a full
      // sort + two RDD passes + checkpoint per skipped round.
      if (k < maxLen && rounds < maxRounds) {
        val d = cur.agg(countDistinct(col("rank")), count(lit(1))).head()
        settled = d.getLong(0) == d.getLong(1)
      }
    }
    cur.filter(col("p") < col("n_real")) // drop the sentinel-only suffixes
      .select((col("rank") - nDocs).as("rank"), col("did").as(idCol), col("p").as("pos"))
  }

  /** Length of the common token prefix of suffix (tkA from pA) and
    * suffix (tkB from pB), 0-based positions. `zip_with` pads the
    * shorter slice with nulls, so the first `false` in the equality
    * zip is the first mismatch OR the first past-end position; no
    * mismatch means the shorter suffix is a full prefix.
    */
  private def lcpExpr(tkA: Column, pA: Column, tkB: Column, pB: Column): Column = {
    val a = slice(tkA, (pA + 1).cast("int"), size(tkA) - pA.cast("int"))
    val b = slice(tkB, (pB + 1).cast("int"), size(tkB) - pB.cast("int"))
    val zipped = zip_with(a, b, (x, y) => coalesce(x === y, lit(false)))
    val firstFalse = array_position(zipped, false)
    when(firstFalse > 0, firstFalse - 1)
      .otherwise(least(size(tkA) - pA, size(tkB) - pB))
  }

  /** DISTRIBUTED exact ExactSubstr spans — [[TextOps.suffixArraySpans]]'
    * output (same schema, same definition of duplication: ≥2 (doc, pos)
    * occurrences anywhere in the corpus, within-doc and overlapping
    * included), computed from the prefix-doubling suffix array instead
    * of a single-task sort:
    *
    *  - adjacent-LCP by self-joining rank r with rank r+1 (each side
    *    rejoins its doc's token array; the LCP expression walks the two
    *    suffix slices — total work = sum of adjacent LCPs, the same
    *    bound the classic sequential scan pays);
    *  - per-position longest duplicated prefix = max LCP with either
    *    suffix-order neighbor;
    *  - per-doc gaps-and-islands merge of [p, p+lmax) intervals with
    *    lmax ≥ n, under a per-doc window (partitioned by doc — no
    *    global sort).
    *
    * Every stage is a shuffle on a bounded key (rank, doc) — this is
    * the form that runs where `suffixArraySpans`'s coalesce(1) cannot.
    */
  def saSpans(docs: DataFrame, n: Int = 8, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val toks = sentineled(docs, idCol, textCol)
      // drop the sentinel again: LCPs never extend into it (unique per
      // doc), so the real-token arrays are all the join needs to carry
      .select(col("did"), expr("slice(tk, 1, n_real)").as("tk"), col("n_real"))
      .localCheckpoint(true)
    val sa = suffixArray(docs, idCol, textCol).localCheckpoint(true)
    val withTk = sa.join(toks, col(idCol) === col("did")).select(col("rank"),
      col("did"), col("pos"), col("tk"))
    val nbr = withTk.select((col("rank") - 1).as("rank"),
      col("tk").as("_tkb"), col("pos").as("_pb"))
    val lcps = withTk.join(nbr, Seq("rank"), "inner")
      .select(col("rank"),
        lcpExpr(col("tk"), col("pos"), col("_tkb"), col("_pb")).as("lcp"))
    // lmax(suffix r) = max(lcp(r-1,r), lcp(r,r+1)); lcps row `rank` holds lcp(r, r+1)
    val lmax = withTk.select(col("rank"), col("did"), col("pos"))
      .join(lcps.select(col("rank"), col("lcp").as("_ln")), Seq("rank"), "left")
      .join(lcps.select((col("rank") + 1).as("rank"), col("lcp").as("_lp")), Seq("rank"), "left")
      .select(col("did"), col("pos"),
        greatest(coalesce(col("_ln"), lit(0L)), coalesce(col("_lp"), lit(0L))).as("lmax"))
    // gaps-and-islands per doc over intervals [pos, pos + lmax), lmax >= n
    import org.apache.spark.sql.expressions.Window
    val iv = lmax.filter(col("lmax") >= n)
      .select(col("did"), col("pos").as("s"), (col("pos") + col("lmax")).as("e"), col("lmax"))
    val w = Window.partitionBy("did").orderBy("s")
    val grouped = iv
      .withColumn("_pe", max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_nw", when(col("_pe").isNull || col("s") > col("_pe"), 1L).otherwise(0L))
      .withColumn("_g", sum(col("_nw")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val spans = grouped.groupBy(col("did"), col("_g"))
      .agg(min(col("s")).as("s0"), max(col("e")).as("e0"))
      .groupBy("did")
      .agg(count(lit(1)).as("n_spans"), sum(col("e0") - col("s0")).as("covered_tokens"))
    val maxDup = iv.groupBy("did").agg(max(col("lmax")).as("max_dup_tokens"))
    toks.select(col("did"), col("n_real").cast("long").as("n_tokens"))
      .join(spans, Seq("did"), "left")
      .join(maxDup, Seq("did"), "left")
      .select(col("did").as(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_dup_tokens"), lit(0L)).as("max_dup_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(when(col("n_tokens") > 0,
          coalesce(col("covered_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .otherwise(0.0), 4).as("dup_cov_ratio"))
  }
}
