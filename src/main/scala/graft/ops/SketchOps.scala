package graft.ops

import graft.functions.ShingleExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Rounding.round // binary rounding, DuckDB-consistent (shadows functions.round)

/** Deterministic, engine-portable sketches: unlike the built-in
  * `approx_count_distinct` / `percentile_approx` (engine-specific
  * states, q48's rows-only gap), these sketches are built from the
  * seeded-md5 hash idiom, so ANY SQL engine replays them bit-exactly —
  * the estimate itself is oracle-checkable, not just "close to exact".
  *
  * Both are one-pass partial-aggregable shapes: the sketch state is a
  * tiny fixed-size table (registers / cells), built map-side and merged
  * by max/sum — exactly the merge discipline that makes them usable as
  * incremental corpus statistics at 100 TB (yesterday's registers merge
  * with today's by the same aggregate).
  */
object SketchOps {

  /** HyperLogLog distinct-shingle estimate per group, replayable in
    * SQL. The item universe is the base-38 8-shingle code (bijective
    * with the shingle — the MinHash base hash, `ShingleCodes`), so the
    * sketch estimates "distinct content mass" per source: the
    * denominator of dup-rate estimates at scales where exact
    * count(DISTINCT shingle) is itself a giant shuffle.
    *
    * Mechanics (classic Flajolet HLL, m = 2^b registers): 60-bit
    * seeded-md5 hash of the code; low b bits pick the register, the
    * remaining 60-b bits' leading-zero rank (rho = (60-b+1) -
    * bitlength) maxes into it. The indicator sum Σ 2^-M_j banks in
    * exact integer 2^(60-b+1)-units (every term 2^((60-b+1)-M_j) is an
    * integer, empty registers contribute the full unit), so the only
    * floating-point steps are the final division and the alpha formula
    * — identical IEEE sequences on both engines. Small-range linear
    * counting (E <= 2.5m with empty registers) matches the standard
    * correction.
    *
    * Plan shape: explode distinct-per-doc shingle codes (map-side,
    * codegen'd) → ONE partial-aggregable groupBy (group, register) max
    * → per-group register fold (m rows per group). The exact
    * count(DISTINCT) rides along for the audit column only — drop it
    * at scale and the sketch is the whole cost.
    *
    * Output: (group, exact_n, n_regs, est_n, rel_err).
    */
  /** HLL register table per group: (g, reg, mj) with at most 2^b rows
    * per group, built by ONE partial-aggregable max — the mergeable
    * sketch STATE. Registers from different corpora / shards / days
    * merge by `groupBy(reg).max(mj)` and estimate identically — the
    * property [[hllMergeAudit]] and the rolling-distinct query prove
    * at the query level. `items` must have columns (g, item).
    */
  def hllRegisters(items: DataFrame, b: Int, seed: Long): DataFrame = {
    require(b >= 4 && b <= 16, s"b out of range: $b")
    val m = 1 << b
    val maxRho = 60 - b + 1 // seededHash is 60-bit (15 hex chars)
    items
      .select(col("g"), SampleOps.seededHash(col("item"), seed).as("h"))
      .select(col("g"),
        col("h").bitwiseAND(lit(m - 1L)).as("reg"),
        shiftright(col("h"), b).as("w"))
      .select(col("g"), col("reg"),
        when(col("w") === 0L, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin(col("w")))).as("rho"))
      .groupBy("g", "reg").agg(max("rho").as("mj"))
  }

  /** Scala-side estimate from a dense register array (index = register,
    * value = M_j, 0 = empty) — EXACTLY the [[hllEstimate]] arithmetic
    * (same integer banking, same alpha, same small-range branch), so a
    * streaming state that folds registers incrementally lands on the
    * identical estimate the batch aggregate produces. Pinned
    * streaming-vs-batch in `StreamingDistinctSpec`.
    */
  def estimateFromRegisters(regs: Array[Int], b: Int): Double = {
    val m = 1 << b
    require(regs.length == m, s"want $m registers, got ${regs.length}")
    val maxRho = 60 - b + 1
    val unitL = 1L << maxRho
    var su = 0L
    var nRegs = 0L
    regs.foreach { mj =>
      if (mj > 0) { su += 1L << (maxRho - mj); nRegs += 1 }
    }
    val unit = math.pow(2.0, maxRho)
    val s = (su + (m - nRegs) * unitL).toDouble / unit
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m.toDouble) * (m.toLong * m).toDouble
    val zeros = m - nRegs
    val eRaw = alphaM2 / s
    if (eRaw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else eRaw
  }

  /** Fold a register table to per-group estimates: (g, n_regs, est).
    * The indicator sum banks in exact integer 2^(60-b+1)-units (every
    * term 2^(maxRho-M_j) is an integer, empty registers contribute the
    * full unit); the only floating-point steps are the final division,
    * the alpha formula and the small-range linear-counting branch —
    * identical IEEE sequences on any engine.
    */
  def hllEstimate(regs: DataFrame, b: Int): DataFrame = {
    val m = 1 << b
    val maxRho = 60 - b + 1
    val unit = math.pow(2.0, maxRho) // exact in double
    val folded = regs.groupBy("g").agg(
      count(lit(1)).as("n_regs"),
      // 2^(maxRho - mj) is an exact integer for mj in [1, maxRho]
      sum(pow(lit(2.0), lit(maxRho) - col("mj")).cast("long")).as("su"))
    val s = (col("su") + (lit(m.toLong) - col("n_regs")) * lit(unit.toLong))
      .cast("double") / lit(unit)
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit((m.toLong * m).toDouble)
    val zeros = lit(m.toLong) - col("n_regs")
    val eRaw = alphaM2 / s
    val est = when(eRaw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double"))).otherwise(eRaw)
    folded.select(col("g"), col("n_regs"), est.as("est"))
  }

  /** Distinct-per-doc shingle codes keyed by group — the HLL item
    * stream of [[hllShingleDistinct]].
    */
  private[ops] def shingleItems(docs: DataFrame, groupExpr: org.apache.spark.sql.Column,
                                k: Int, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(groupExpr.as("g"),
        explode(ShingleExprs.shingleCodes(
          TextOps.normalized(col(textCol)), k, sortedDistinct = true)).as("item"))

  def hllShingleDistinct(docs: DataFrame, groupCol: String = "source",
                         b: Int = 8, seed: Long = 7L, k: Int = 8,
                         textCol: String = "text"): DataFrame = {
    // the registers AND the exact audit column both read the shingle
    // stream; it is deliberately NOT checkpointed — the explode is
    // map-only codegen off the scan, and materializing the ~50×
    // exploded rows costs more than the second scan (measured ×10:
    // checkpoint 7.5s vs recompute 5.7s). Production drops the exact
    // column and the stream has one consumer anyway.
    val codes = shingleItems(docs, col(groupCol), k, textCol)
    val exact = codes.groupBy("g").agg(countDistinct("item").as("exact_n"))
    hllEstimate(hllRegisters(codes, b, seed), b)
      .join(exact, Seq("g"))
      .select(col("g").as(groupCol), col("exact_n"), col("n_regs"),
        round(col("est"), 4).as("est_n"),
        round((round(col("est"), 4) - col("exact_n")) / col("exact_n").cast("double"), 4)
          .as("rel_err"))
  }

  /** Sketch-merge audit: registers built INDEPENDENTLY per corpus half
    * (doc_id parity), merged by register-wise max, estimate compared
    * against the exact distinct of the union — the query-level proof
    * that yesterday's registers + today's registers = the union's
    * registers, i.e. the incremental corpus statistic never rescans
    * history. Output one row: (est_a, est_b, est_union, exact_union,
    * rel_err), estimates 4dp.
    */
  def hllMergeAudit(docs: DataFrame, b: Int = 8, seed: Long = 7L, k: Int = 8,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val items = shingleItems(docs, (col(idCol) % 2).cast("int").as("g"), k, textCol)
      .localCheckpoint(true) // registers + exact union both read it
    val halves = hllEstimate(hllRegisters(items, b, seed), b)
    val perHalf = halves.agg(
      max(when(col("g") === 0, round(col("est"), 4))).as("est_a"),
      max(when(col("g") === 1, round(col("est"), 4))).as("est_b"))
    val merged = hllEstimate(
      hllRegisters(items, b, seed).groupBy("reg").agg(max("mj").as("mj"))
        .select(lit("u").as("g"), col("reg"), col("mj")), b)
      .select(round(col("est"), 4).as("est_union"))
    val exact = items.agg(countDistinct("item").as("exact_union"))
    perHalf.crossJoin(merged).crossJoin(exact)
      .select(col("est_a"), col("est_b"), col("est_union"), col("exact_union"),
        round((col("est_union") - col("exact_union")) / col("exact_union").cast("double"), 4)
          .as("rel_err"))
  }

  /** Rolling 7-day distinct users by windowed register merge: the
    * sketch answer to q164's exact distinct-then-expand — per-day
    * register tables (≤ 2^b rows/day) expand ×7 map-side and merge by
    * max, so the rolling-distinct cost is days × m rows instead of
    * days × users. The exact count rides along for the audit column.
    *
    * Output: (day, exact_users, est_users, rel_err).
    */
  def hllRollingDistinct(events: DataFrame, b: Int = 8, seed: Long = 9L,
                         userCol: String = "user_id",
                         secCol: String = "sec"): DataFrame = {
    val act = events.select((col(secCol) / 86400L).cast("long").as("d"),
        col(userCol).as("item")).distinct()
      .localCheckpoint(true) // registers + exact expansion + day grid all read it
    val days = act.select(col("d")).distinct()
    val regs = hllRegisters(act.select(col("d").as("g"), col("item")), b, seed)
    val offsets = explode(sequence(lit(0L), lit(6L))).as("off")
    val windowRegs = regs.select(col("g"), col("reg"), col("mj"), offsets)
      .select((col("g") + col("off")).as("wd"), col("reg"), col("mj"))
      .join(days.select(col("d").as("wd")), Seq("wd"))
      .groupBy("wd", "reg").agg(max("mj").as("mj"))
    val est = hllEstimate(windowRegs.select(col("wd").as("g"), col("reg"), col("mj")), b)
    val exact = act.select(col("d"), col("item"), offsets)
      .select((col("d") + col("off")).as("wd"), col("item"))
      .join(days.select(col("d").as("wd")), Seq("wd"))
      .select(col("wd"), col("item")).distinct()
      .groupBy("wd").agg(count(lit(1)).as("exact_users"))
    est.select(col("g").as("wd"), round(col("est"), 4).as("est_users"))
      .join(exact, Seq("wd"))
      .select(col("wd").as("day"), col("exact_users"), col("est_users"),
        round((col("est_users") - col("exact_users")) / col("exact_users").cast("double"), 4)
          .as("rel_err"))
  }

  /** Histogram percentile sketch + exact audit: per group, estimate
    * quantiles from a fixed-width value histogram (bucket = 0.01) —
    * the engine-portable percentile sketch beside [[hllShingleDistinct]]
    * (q48's `percentile_approx` state is engine-specific; a banked
    * histogram replays anywhere, merges across shards by bucket-wise
    * SUM, and carries a HARD error bound: within half a bucket of the
    * empirical quantile, so within one bucket width plus interpolation
    * of the exact interpolated quantile — the emitted audit columns
    * measure it per row).
    *
    * Estimate = midpoint of the first bucket whose cumulative count
    * reaches ceil(q·n). Plan shape: one (group, bucket) aggregate,
    * a cumulative window over the per-group DISTINCT buckets
    * (value-range bounded, never the corpus), exact percentiles ride
    * along for the audit only.
    *
    * Output per group: (g, n, p50_est, p50_exact, p50_err, p90_est,
    * p90_exact, p90_err).
    */
  def histogramPercentiles(rows: DataFrame, groupCol: String = "g",
                           valueCol: String = "v"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = rows.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .localCheckpoint(true) // histogram + the exact audit both read it
    val hist = base
      .select(col("g"), floor(col("v") * 100).cast("long").as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = hist.groupBy("g").agg(sum("c").as("n"))
    val cums = hist.withColumn("cum", sum("c").over(w))
      .join(broadcast(tot), Seq("g"))
    def est(q: Double) = round(
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("b"))) / 100 + 0.005, 4)
    val sketch = cums.groupBy("g", "n")
      .agg(est(0.5).as("p50_est"), est(0.9).as("p90_est"))
    val exact = base.groupBy("g")
      .agg(round(expr("percentile(v, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(v, 0.9)"), 4).as("p90_exact"))
    sketch.join(exact, Seq("g"))
      .select(col("g"), col("n"),
        col("p50_est"), col("p50_exact"),
        round(abs(col("p50_est") - col("p50_exact")), 4).as("p50_err"),
        col("p90_est"), col("p90_exact"),
        round(abs(col("p90_est") - col("p90_exact")), 4).as("p90_err"))
  }

  /** Count-Min sketch over the token stream + an audit of the exact
    * top-K heavy hitters against it: est = min over depth rows of the
    * hashed cell, the classic eps-delta overestimate bound. The sketch
    * is depth × width longs — a corpus-wide term-frequency summary
    * that merges across shards by cell-wise SUM, where the exact
    * per-term count table it approximates is vocabulary-sized.
    *
    * Plan shape: ONE token-count aggregate (the sketch is additive, so
    * building it from per-term counts ≡ from the raw stream at a
    * fraction of the rows) → depth-way map-side fan-out → groupBy
    * (row, cell) sum. The top-K probe side is take-ordered K rows; the
    * sketch joins to it broadcast. Everything is integer arithmetic —
    * no rounding discipline needed at all.
    *
    * Output: (term, true_n, est_n, overcount), overcount >= 0 always.
    */
  def countMinAudit(docs: DataFrame, depth: Int = 4, width: Int = 256,
                    topK: Int = 20, seedBase: Long = 100L,
                    textCol: String = "text"): DataFrame = {
    val counts = docs.filter(col(textCol).isNotNull)
      .select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // read twice: sketch build + exact top-K probe
    val ds = (1 to depth).map(d => lit(d.toLong))
    def withBuckets(df: DataFrame): DataFrame = df
      .select(col("term"), col("n"), explode(array(ds: _*)).as("d"))
      .withColumn("bucket",
        pmod(SampleOpsSeed.hash(col("d"), col("term"), seedBase), lit(width.toLong)))
    // the corpus-sized bucket fan-out feeds ONLY the sketch aggregate;
    // the probe side re-derives buckets for its K rows (80 hashes beat
    // materializing vocab x depth)
    val sketch = withBuckets(counts).groupBy("d", "bucket").agg(sum("n").as("cell"))
    val top = counts.orderBy(col("n").desc, col("term").asc).limit(topK)
    withBuckets(top)
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy("term", "n").agg(min("cell").as("est_n"))
      .select(col("term"), col("n").as("true_n"), col("est_n"),
        (col("est_n") - col("n")).as("overcount"))
  }
}

/** The per-depth seeded hash of [[SketchOps.countMinAudit]], split out
  * so the expression is stated once: md5("(seedBase+d):term" ) 60-bit
  * prefix — the [[SampleOps.seededHash]] idiom with the depth folded
  * into the seed, replayed in SQL as
  * `CAST('0x' || substr(md5(CAST(100+d AS VARCHAR) || ':' || term), 1, 15) AS BIGINT)`.
  */
private[ops] object SampleOpsSeed {
  import org.apache.spark.sql.Column
  def hash(d: Column, term: Column, seedBase: Long): Column =
    graft.functions.Md5PrefixExprs.md5Prefix(
      concat_ws(":", (lit(seedBase) + d).cast("string"), term), 15)
}
