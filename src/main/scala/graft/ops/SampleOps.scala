package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.Rounding.round // binary rounding, DuckDB-consistent (shadows functions.round)

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Everything keys off a content-independent hash of the row id, so
  * membership is reproducible across runs, engines, and data layout —
  * unlike `df.sample`, whose assignment depends on partition seeds and
  * so reshuffles membership whenever the input repartitions. The hash is
  * the md5-prefix trick used across the engine (engine-portable: any
  * SQL dialect can replay it), evaluated per row in codegen — no
  * shuffle, no state.
  */
object SampleOps {

  /** Stable bucket in [0, buckets) from the id's md5 prefix.
    * (Unseeded 8-hex-char form — the key several committed oracles
    * replay verbatim; widening or seeding it would change q57/q61/q87
    * membership, so seeded consumers use [[seededHash]] instead.)
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    graft.functions.Md5PrefixExprs.md5Prefix(id.cast("string"), 8) % buckets

  /** 60-bit engine-portable hash of `seed:id` — the md5-prefix idiom
    * with a seed prefix (15 hex chars stay inside Long range; any SQL
    * dialect replays it as `CAST('0x' || substr(md5(..), 1, 15) AS
    * BIGINT)`).
    */
  def seededHash(id: Column, seed: Long): Column =
    graft.functions.Md5PrefixExprs.md5Prefix(
      concat_ws(":", lit(seed), id.cast("string")), 15)

  /** LEAKAGE-SAFE train/valid/test split: a document's split is keyed
    * on its near-dup COMPONENT anchor (the min id of its cluster under
    * the supplied candidate edges; singletons anchor to themselves),
    * not its own id — so two near-duplicate documents can never
    * straddle train and test. Plain hash splits leak: with 10% dup
    * mass a q57-style split puts ~1 in 5 dup pairs across the
    * train/test boundary, and the eval set rewards memorization.
    *
    * Plan shape: components come from [[GraphOps.connectedComponents]]
    * (adaptive union-find / pointer jumping — edges only, never the
    * corpus); the corpus itself takes ONE left join on the id key and a
    * map-only bucket hash. Docs outside every edge stream through with
    * their own id as anchor.
    *
    * Output: (<idCol>, split_key, split).
    */
  def leakageSafeSplit(docs: org.apache.spark.sql.DataFrame,
                       edges: org.apache.spark.sql.DataFrame,
                       trainPct: Int = 90, validPct: Int = 5,
                       idCol: String = "doc_id", srcCol: String = "id_a",
                       dstCol: String = "id_b"): org.apache.spark.sql.DataFrame = {
    val comp = GraphOps.connectedComponents(edges, srcCol, dstCol)
    docs.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("component"), col("id")).as("split_key"))
      .withColumn("split", assignSplit(col("split_key"), trainPct, validPct))
  }

  /** Leakage-safe k-fold cross-validation assignment: like
    * [[leakageSafeSplit]] but into `k` folds — the fold is keyed on
    * the near-dup COMPONENT anchor, so no candidate pair can straddle
    * folds and every fold's held-out eval stays memorization-free.
    * Same plan shape as the split: components from the edges only,
    * one left join on the id key, map-only bucket hash.
    *
    * Output: (<idCol>, fold_key, fold) with fold in [0, k).
    */
  def leakageSafeFolds(docs: org.apache.spark.sql.DataFrame,
                       edges: org.apache.spark.sql.DataFrame, k: Int = 5,
                       idCol: String = "doc_id", srcCol: String = "id_a",
                       dstCol: String = "id_b"): org.apache.spark.sql.DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    val comp = GraphOps.connectedComponents(edges, srcCol, dstCol)
    docs.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("component"), col("id")).as("fold_key"))
      .withColumn("fold", hashBucket(col("fold_key"), k).cast("int"))
  }

  /** Water-filling mixture allocation under capacity caps: give each
    * source alloc = min(capacity, λ·weight) with λ the largest value
    * whose total fits the token `budget` — the mixture-realization
    * rule when sources have FINITE capacity (epoch caps): saturated
    * sources take their whole capacity, the freed budget re-levels
    * across the rest. q141 realizes uncapped weights; this is its
    * constrained form.
    *
    * Exactness: the fill level never materializes as a float —
    * saturation tests are integer cross-multiplications
    * ((B−C_prev)·w6 ≥ cap·W6_rest, decimal-exact), and the unsaturated
    * pool divides by exact integer floor + largest-remainder (the
    * q201 discipline), so Σ alloc = min(budget, Σ capacity) in ANY
    * engine. Sorting by cap/weight makes saturation a prefix property,
    * so the whole solve is ONE pass of windows over the |sources|-row
    * frame (categories, never the corpus).
    *
    * Output: (source, capacity, alloc, saturated).
    */
  def waterfillAllocation(sources: org.apache.spark.sql.DataFrame, budget: Long,
                          srcCol: String = "source", weightCol: String = "weight",
                          capCol: String = "capacity"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = sources
      .select(col(srcCol).as("src"),
        round(col(weightCol) * 1e6).cast("long").as("w6"),
        col(capCol).cast("long").as("cap"))
      .filter(col("w6") > 0 && col("cap") >= 0)
    val ord = Window.orderBy(col("cap").cast("double") / col("w6"), col("src"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = broadcast(base.agg(sum("w6").as("__wtot")))
    val flagged = base
      .withColumn("__cprev", coalesce(sum("cap").over(ord), lit(0L)))
      .withColumn("__wprev", coalesce(sum("w6").over(ord), lit(0L)))
      .crossJoin(tot)
      .withColumn("__sat",
        (lit(budget) - col("__cprev")).cast("decimal(38,0)") * col("w6")
          >= col("cap").cast("decimal(38,0)") * (col("__wtot") - col("__wprev")))
      .localCheckpoint(true) // the pool aggregate + the allocation both read it
    val rem = broadcast(flagged.agg(
      sum(when(col("__sat"), col("cap")).otherwise(0L)).as("__csat"),
      sum(when(!col("__sat"), col("w6")).otherwise(0L)).as("__wrem")))
    def intDiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val alloc = flagged.crossJoin(rem)
      .withColumn("__brem", lit(budget) - col("__csat"))
      .withColumn("__floor", when(col("__sat"), col("cap"))
        .when(col("__wrem") > 0, intDiv(col("__brem") * col("w6"), col("__wrem")))
        .otherwise(lit(0L)))
      .withColumn("__remd", when(!col("__sat") && col("__wrem") > 0,
        pmod(col("__brem") * col("w6"), col("__wrem"))).otherwise(lit(0L)))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rk = Window.partitionBy("__sat").orderBy(col("__remd").desc, col("src").asc)
    alloc
      .withColumn("__unsatFloor",
        sum(when(!col("__sat"), col("__floor")).otherwise(0L)).over(all))
      .withColumn("__rk", row_number().over(rk))
      .select(col("src").as(srcCol), col("cap").as(capCol),
        (col("__floor") + when(!col("__sat")
          && col("__rk") <= col("__brem") - col("__unsatFloor"), 1L).otherwise(0L))
          .as("alloc"),
        col("__sat").as("saturated"))
  }

  /** Consistent-hash ring assignment: each key goes to the shard of
    * the first virtual node at or after its hash on the ring (wrapping
    * to the global minimum) — the sharding scheme whose RESHARD cost
    * is ~1/(n+1) of the keys when a shard is added, where mod-n
    * rehashing moves ~n/(n+1) of a 100 TB lake. Vnode hashes are the
    * seeded-md5 idiom keyed "shard:vnode", so growing the ring keeps
    * every existing vnode in place (the property the audit measures).
    *
    * Plan shape: the ring is shards × vnodesPerShard rows, broadcast;
    * the lookup is expressed as a conditional-min aggregate over the
    * key × ring fan-out (bounded amplification = ring size; a binary-
    * search expression would remove it, but the aggregate form is the
    * engine-replayable one and the ring is tiny by construction).
    *
    * Output: (<keyCol>, shard).
    */
  def ringAssign(keys: org.apache.spark.sql.DataFrame, nShards: Int,
                 vnodesPerShard: Int = 16, seed: Long = 13L,
                 keyCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    require(nShards >= 1 && vnodesPerShard >= 1)
    val spark = keys.sparkSession
    import spark.implicits._
    val ring = (0 until nShards).flatMap(sh => (0 until vnodesPerShard).map(v => (sh, v)))
      .toDF("shard", "v")
      .select(col("shard"),
        seededHash(concat_ws(":", col("shard"), col("v")), seed).as("vh"))
    val hashed = keys.select(col(keyCol), seededHash(col(keyCol), seed + 1).as("__kh"))
    hashed.crossJoin(broadcast(ring))
      .groupBy(keyCol, "__kh")
      .agg(min(when(col("vh") >= col("__kh"), col("vh"))).as("__vh_ge"),
        min("vh").as("__vh_any"))
      .select(col(keyCol), coalesce(col("__vh_ge"), col("__vh_any")).as("vh"))
      .join(broadcast(ring), Seq("vh"))
      .select(col(keyCol), col("shard"))
  }

  /** Resharding audit, ring vs mod: assign every key under n and n+1
    * shards with both schemes and report the moved fraction and the
    * post-reshard balance — the number that decides whether adding
    * capacity to a 100 TB lake is an overnight job or a full rewrite.
    *
    * Output: one row per scheme (scheme, n_keys, moved, moved_frac
    * 4dp, max_share_after 4dp).
    */
  def reshardAudit(keys: org.apache.spark.sql.DataFrame, nShards: Int = 8,
                   vnodesPerShard: Int = 16, seed: Long = 13L,
                   keyCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val before = ringAssign(keys, nShards, vnodesPerShard, seed, keyCol)
      .withColumnRenamed("shard", "__s0")
    val after = ringAssign(keys, nShards + 1, vnodesPerShard, seed, keyCol)
      .withColumnRenamed("shard", "__s1")
    val ringPairs = before.join(after, Seq(keyCol))
      .localCheckpoint(true) // moved rollup + balance rollup both read it
    def summarize(pairs: org.apache.spark.sql.DataFrame, scheme: String) = {
      val base = pairs
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("__s0") =!= col("__s1"), 1L).otherwise(0L)).as("moved"))
      val bal = pairs.groupBy("__s1").agg(count(lit(1)).as("__n"))
        .agg(max("__n").as("__mx"))
      base.crossJoin(bal)
        .select(lit(scheme).as("scheme"), col("n_keys"), col("moved"),
          Rounding.round(col("moved") / col("n_keys").cast("double"), 4).as("moved_frac"),
          Rounding.round(col("__mx") / col("n_keys").cast("double"), 4).as("max_share_after"))
    }
    val kh = seededHash(col(keyCol), seed + 1)
    val modPairs = keys
      .select(col(keyCol), pmod(kh, lit(nShards.toLong)).as("__s0"),
        pmod(kh, lit(nShards + 1L)).as("__s1"))
    summarize(ringPairs, "ring").unionByName(summarize(modPairs, "mod"))
  }

  /** Deterministic train/valid/test assignment by hash bucket:
    * `[0, trainPct)` → train, `[trainPct, trainPct+validPct)` → valid,
    * rest → test. Percentages of 100.
    */
  def assignSplit(id: Column, trainPct: Int = 90, validPct: Int = 5): Column = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"invalid split percentages: train=$trainPct valid=$validPct")
    val b = hashBucket(id, 100)
    when(b < trainPct, "train").when(b < trainPct + validPct, "valid").otherwise("test")
  }

  /** Deterministic Bernoulli-style sample: keeps ids whose hash bucket
    * (out of 10000) falls below `fraction * 10000` — stable under
    * repartitioning and incremental reruns (a row's membership never
    * changes as the corpus grows).
    */
  def deterministicKeep(id: Column, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    // round, not truncate: 0.3 * 10000 is 2999.999... in binary
    hashBucket(id, 10000) < math.round(fraction * 10000)
  }

  /** Deterministic per-group quota: at most `n` rows per group, chosen
    * by hash order (id as the tie-break) — a reproducible stratified
    * sample with exact quotas ("5k eval docs per language"). One window
    * sort per group; for quota ≪ group size at extreme scale, pre-filter
    * with [[deterministicKeep]] at a safely-above-quota fraction first
    * so the sort ranks a small superset instead of the full corpus.
    */
  def groupQuota(df: org.apache.spark.sql.DataFrame, groupCol: String, idCol: String,
                 n: Int): org.apache.spark.sql.DataFrame = {
    require(n > 0, s"quota must be positive: $n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), 1000000000), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /** Deterministic stratified Bernoulli sample: per-stratum keep
    * fractions (e.g. "3% of en, 100% of ko"), membership decided by
    * the id hash exactly as [[deterministicKeep]] — reproducible under
    * repartitioning, growth, and engine replay. Strata missing from
    * `fractions` keep nothing (explicit allowlist semantics). The
    * fractions ride a codegen'd when-chain — no join; at thousands of
    * strata switch to a broadcast fraction table instead.
    */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, strataCol: String,
                       idCol: String, fractions: Map[String, Double]): org.apache.spark.sql.DataFrame = {
    require(fractions.nonEmpty, "stratifiedSample needs at least one stratum fraction")
    val keep = fractions.toSeq.sortBy(_._1).map { case (k, f) =>
      when(col(strataCol) === k, deterministicKeep(col(idCol), f))
    }.reduce(coalesce(_, _))
    df.filter(coalesce(keep, lit(false)))
  }

  /** Seeded deterministic global shuffle into training shards: every
    * row gets `(shard, shard_pos)` from the md5 of `seed:id` — the
    * shard by hash modulus, the position by hash order within the
    * shard. Reading shards in order (shard 0 pos 0, 1, …, shard 1 …)
    * yields a reproducible global permutation of the corpus: the
    * "shuffle the training data, the same way, every run" step before
    * sequence packing, with a new permutation one seed bump away.
    *
    * SCALE: the naive form — `row_number() OVER (ORDER BY hash)` — is
    * a single-task global sort. Sharding first makes the window
    * per-shard: one shuffle on the shard key, each task sorting
    * corpus/numShards rows; size numShards so a shard fits a task
    * (the output is usually written `partitionBy(shard)` anyway).
    *
    * INCREMENTAL CONTRACT (pinned in SeriesSampleSpec): everything is
    * a pure function of (seed, id), so under repartitioning the output
    * is bit-identical, and under corpus GROWTH (a) every existing row
    * keeps its `shard` and (b) existing rows keep their relative order
    * within the shard — new rows interleave without swapping old
    * neighbors. Absolute `shard_pos` values are NOT stable under
    * growth: an inserted row shifts every row hashing behind it up by
    * one. Resumable consumers must address by (shard, hash order) —
    * e.g. "resume after id X", not "resume at shard_pos N" — or
    * re-derive positions after ingest.
    */
  def shardShuffle(df: org.apache.spark.sql.DataFrame, idCol: String,
                   numShards: Int, seed: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val h = seededHash(col(idCol), seed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % numShards).cast("int"))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }

  /** Greedy token-budget packing: per group (source, domain, shard),
    * admit documents in hash order until the group's cumulative token
    * count reaches `budget` — the deterministic "assemble N tokens per
    * source" step of corpus construction. The first doc crossing the
    * budget is still admitted (its tokens were needed to reach it), so
    * every group with data reaches its budget; membership is stable
    * because the order is the [[hashBucket]] order, never file layout.
    * Output: input columns + cumulative token count.
    *
    * SCALE: the window partitions BY GROUP, so every source lands on
    * exactly one task — at 100 TB a source holds ~10⁹ heavy rows and
    * the uncut sort is a single-task spill/OOM, while the budget admits
    * ~10⁵ of them. When a group's token mass is at least
    * `preFilterEngageRatio × margin × budget` (i.e. the cut would shed
    * ≥ that factor of sort input), each over-budget group is first cut
    * to a hash-PREFIX superset sized `preFilterMargin × budget` tokens
    * (expected), bounding per-task input regardless of corpus size.
    * Because the cut key IS the pack-order key, the kept rows are
    * exactly a prefix of the group's pack order, so packing the
    * superset produces the identical result whenever the superset
    * holds ≥ budget tokens. EXACTNESS is unconditional: any group
    * whose prefix came up short (a Chernoff-tail event at margin 4 —
    * the prefix's expected token mass is margin × budget) is detected
    * by comparing superset mass to the budget and repacked uncut, so
    * the fast path never changes the answer, only the cost. Below the
    * engage threshold (every group comfortably sorts on one task) the
    * plan is the plain single window — the pre-filter's extra passes
    * cost more than a small sort saves (measured in SCALE.md), so the
    * engine doesn't pay them where they can't win. Null-key groups
    * always pack uncut. `preFilterEngageRatio` doubles as a mode knob:
    * `Double.PositiveInfinity` = never cut and skip the engage-check
    * job too, `0` = always cut without checking.
    *
    * LAZY BY DEFAULT: any finite `preFilterEngageRatio` runs an EAGER
    * Spark job at call time (the engage-check aggregates the input's
    * per-group token mass before the caller ever triggers an action) —
    * which re-executes an unpersisted upstream pipeline whole. The
    * default is therefore `PositiveInfinity` (plain lazy window, no
    * hidden job); callers packing a PERSISTED heavy corpus opt in with
    * a finite ratio (32 is the measured break-even, SCALE.md).
    */
  def tokenBudgetPack(df: org.apache.spark.sql.DataFrame, groupCol: String,
                      idCol: String, tokenCol: String, budget: Long,
                      preFilterMargin: Double = 4.0,
                      preFilterEngageRatio: Double = Double.PositiveInfinity): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(preFilterMargin >= 1.0, s"preFilterMargin must be >= 1: $preFilterMargin")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), 1000000000), col(idCol))
    def pack(in: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      in.withColumn("cum_tokens",
          sum(col(tokenCol)).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .filter(col("cum_tokens") - col(tokenCol) < budget)

    // mode short-circuits: an infinite ratio means "never cut" (plain
    // single-window plan, NO engage-check job — the check re-runs the
    // input's upstream plan, which a caller with an unpersisted heavy
    // pipeline above the pack must not pay); 0 means "always cut"
    if (preFilterEngageRatio.isPosInfinity) return pack(df)
    val grouped = df.filter(col(groupCol).isNotNull)
    val stats = packStats(grouped, groupCol, tokenCol)
    if (preFilterEngageRatio > 0) {
      // engage check: one tiny partial-agg job (group-count rows), paid
      // before deciding; the biggest group's mass tells whether any task
      // is concentrated enough for the cut to matter
      val maxTotal = stats.agg(max(col("__total"))).collect()
        .headOption.filterNot(_.isNullAt(0)).map(_.getDouble(0)).getOrElse(0.0)
      if (maxTotal <= preFilterEngageRatio * preFilterMargin * budget) return pack(df)
    }

    val superset = packSuperset(grouped, stats, groupCol, idCol, budget, preFilterMargin)
    // prefix mass check: a cut group whose superset missed the budget
    // (while the full group had more) must repack uncut. LEFT join from
    // stats with coalesce(0): a group whose prefix cut EVERY row has no
    // superset aggregation row at all, and must fail too, not vanish
    val failed = broadcast(stats)
      .join(superset.groupBy(col(groupCol)).agg(sum(col(tokenCol)).cast("double").as("__sup")),
        Seq(groupCol), "left")
      .filter(coalesce(col("__sup"), lit(0.0)) < budget &&
        coalesce(col("__sup"), lit(0.0)) < col("__total"))
      .select(groupCol)
    val fast = pack(superset.join(broadcast(failed), Seq(groupCol), "left_anti"))
    val exactTail = df.filter(col(groupCol).isNull)
      .unionByName(grouped.join(broadcast(failed), Seq(groupCol), "left_semi"))
    fast.unionByName(pack(exactTail))
  }

  /** [[tokenBudgetPack]]'s hash-prefix superset cut, shared with the
    * stress harness so measured sort-input numbers can never drift from
    * the predicate the engine actually runs: groups totaling ≤ margin ×
    * budget pass whole; others keep the hash-prefix sized to margin ×
    * budget expected tokens. `stats` is (groupCol, __total: double).
    */
  private[graft] def packSuperset(grouped: org.apache.spark.sql.DataFrame,
                                  stats: org.apache.spark.sql.DataFrame,
                                  groupCol: String, idCol: String,
                                  budget: Long, margin: Double): org.apache.spark.sql.DataFrame = {
    val keepAll = col("__total") <= lit(margin) * lit(budget)
    val frac = lit(margin) * lit(budget) / col("__total")
    grouped.join(broadcast(stats), Seq(groupCol))
      .filter(keepAll || hashBucket(col(idCol), 1000000000) < frac * 1e9)
      .drop("__total")
  }

  /** Per-group token totals in [[packSuperset]]'s expected shape. */
  private[graft] def packStats(grouped: org.apache.spark.sql.DataFrame,
                               groupCol: String, tokenCol: String): org.apache.spark.sql.DataFrame =
    grouped.groupBy(col(groupCol)).agg(sum(col(tokenCol)).cast("double").as("__total"))

  /** Concat-and-chunk sequence packing (the GPT-style training-batch
    * layout): documents concatenate in deterministic hash order and the
    * stream splits into fixed `contextTokens` windows; each doc reports
    * the window its FIRST token lands in, its token offset inside that
    * window, and whether it crosses a window boundary (straddlers are
    * the rows an attention-mask or document-boundary loss treatment
    * cares about). Pure integer arithmetic over one running sum per
    * group — exactly replayable by any SQL engine.
    *
    * Shape: one window sort per group, same cost class as
    * [[tokenBudgetPack]] (and the same hash-prefix thinking applies if
    * a group ever needs packing without sorting it whole — packing is
    * usually run per shard, where the group IS the task's data).
    * Output: input columns + seq_idx, seq_offset, crosses_boundary.
    */
  def sequencePack(df: org.apache.spark.sql.DataFrame, groupCol: String,
                   idCol: String, tokenCol: String,
                   contextTokens: Long): org.apache.spark.sql.DataFrame = {
    require(contextTokens > 0, s"contextTokens must be positive: $contextTokens")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), 1000000000), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // floor(x / c), not `x / c` cast: Spark's `/` on integral types is
    // DOUBLE division — fine for magnitude (< 2^53) but floor() keeps
    // the semantics explicit and matches the oracle's floor spelling
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("__start", col("__cum") - col(tokenCol))
      .withColumn("seq_idx", floor(col("__start") / contextTokens))
      .withColumn("seq_offset", col("__start") % contextTokens)
      .withColumn("crosses_boundary",
        floor((col("__cum") - lit(1)) / contextTokens) =!= floor(col("__start") / contextTokens))
      .drop("__cum", "__start")
  }

  /** Temperature-scaled mixture weights over a per-group size frame
    * (the "domain mixing" step of corpus assembly: sample source `s`
    * with probability ∝ `n_s^temperature`, temperature < 1 up-weighting
    * small sources). Input is one row per group with a size column;
    * adds `weight = n^t / Σ n^t`.
    *
    * The normalizing sum runs as an unpartitioned window over the
    * per-group frame — #groups rows by construction (sources, domains,
    * languages: tens to thousands), so the single-partition window is
    * the right plan; the big corpus itself is never touched here.
    */
  def mixtureWeights(perGroup: org.apache.spark.sql.DataFrame, nCol: String,
                     temperature: Double): org.apache.spark.sql.DataFrame = {
    val p = pow(col(nCol).cast("double"), lit(temperature))
    perGroup.withColumn("__p", p)
      .withColumn("weight",
        col("__p") / sum(col("__p")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .drop("__p")
  }

  /** Concat-and-chunk pretraining layout — the GPT-style tokenization
    * plan: documents stream in the [[shardShuffle]] order, concatenate
    * per shard, and cut into fixed `chunkTokens` windows; this op
    * computes, for every document, its shard-local token offset and the
    * chunk span it lands in (first/last chunk index, chunks touched) —
    * the metadata a chunk writer needs WITHOUT materializing token
    * arrays.
    *
    * Plan shape: layout is the seeded-hash shard shuffle; the offset is
    * one per-shard running-sum window (no global sort — chunk indices
    * are per-shard by design, exactly how a sharded pretraining corpus
    * is cut). Chunk indices use exact integer arithmetic
    * ((o − o mod L)/L — a division of an exact multiple, bit-identical
    * in any engine). Output: (<idCol>, shard, shard_pos, <tokenCol>,
    * tok_offset, first_chunk, last_chunk, n_chunks).
    */
  def concatChunkLayout(df: org.apache.spark.sql.DataFrame, idCol: String, tokenCol: String,
                        numShards: Int, chunkTokens: Int,
                        seed: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    val laid = shardShuffle(df.filter(col(tokenCol).isNotNull && col(tokenCol) > 0),
      idCol, numShards, seed)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("shard_pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    def intDiv(c: Column): Column = ((c - pmod(c, lit(chunkTokens.toLong))) / chunkTokens).cast("long")
    laid
      .withColumn("tok_offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("first_chunk", intDiv(col("tok_offset")))
      .withColumn("last_chunk", intDiv(col("tok_offset") + col(tokenCol) - 1))
      .select(col(idCol), col("shard"), col("shard_pos"), col(tokenCol), col("tok_offset"),
        col("first_chunk"), col("last_chunk"),
        (col("last_chunk") - col("first_chunk") + 1).as("n_chunks"))
  }

  /** Borda rank fusion of quality signals — combine k per-document
    * scores (higher = better) into one consensus ordering by averaging
    * each document's COMPETITION rank under every signal, then take the
    * top `n` (lowest average rank; ties to the smaller id). The
    * ensemble gate for corpora where no single quality signal is
    * trusted alone.
    *
    * Plan shape: ranks come from a VALUE-HISTOGRAM cumsum, not a global
    * row_number — each signal's 4dp-rounded values aggregate to ≤ 10⁴
    * bins, the strictly-greater mass cumsums over that bounded bin
    * table, and ranks join back on the value. No corpus-wide sort
    * anywhere except the final distributed take-ordered top-n. `scored`
    * is referenced once per signal plus once — same caller-persist
    * contract as `TextOps.perplexityBuckets`.
    *
    * Output: (<idCol>, rank_<signal>..., borda, rank).
    */
  def bordaRank(scored: org.apache.spark.sql.DataFrame, idCol: String,
                signalCols: Seq[String], n: Int): org.apache.spark.sql.DataFrame = {
    require(signalCols.nonEmpty, "bordaRank needs at least one signal")
    val ranked = signalCols.foldLeft(scored) { (acc, s) =>
      val hist = scored.groupBy(col(s)).agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(s).desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val ranks = hist.withColumn(s"rank_$s", (coalesce(sum("__c").over(w), lit(0L)) + 1L))
        .select(col(s), col(s"rank_$s"))
      acc.join(broadcast(ranks), Seq(s))
    }
    val borda = signalCols.map(s => col(s"rank_$s")).reduce(_ + _)
      .cast("double") / signalCols.length
    ranked
      .withColumn("borda", round(borda, 4))
      .orderBy(col("borda").asc, col(idCol).asc).limit(n)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("borda").asc, col(idCol).asc)))
      .select((col(idCol) +: signalCols.map(s => col(s"rank_$s"))) :+
        col("borda") :+ col("rank"): _*)
  }

  /** Shard-balance report for a [[shardShuffle]] layout — per shard,
    * its doc count, token mass and load factor vs the ideal equal
    * split (n_tokens · numShards / total): the operational check that a
    * chosen shard count feeds every trainer rank evenly (a load factor
    * far from 1 on a shard means stragglers at epoch boundaries).
    *
    * One layout pass + one |shards|-row rollup; the total joins back as
    * a broadcast scalar. Output: (shard, n_docs, n_tokens, load_factor).
    */
  def shardBalance(df: org.apache.spark.sql.DataFrame, idCol: String, tokenCol: String,
                   numShards: Int, seed: Long = 0L): org.apache.spark.sql.DataFrame = {
    val laid = shardShuffle(df.filter(col(tokenCol).isNotNull), idCol, numShards, seed)
    val per = laid.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"))
    val total = broadcast(per.agg(sum("n_tokens").as("total")))
    per.crossJoin(total)
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") * numShards / col("total"), 6).as("load_factor"))
  }

  /** Weighted sample WITHOUT replacement, deterministic — the
    * Efraimidis–Spirakis A-ES scheme on a seeded hash: each row draws
    * u ∈ (0, 1] from its id hash and ranks by key = u^(1/w); the top-n
    * per group is EXACTLY a weight-proportional sample without
    * replacement, reproducible across runs/layout/engines (same
    * hash → same sample). The quality-weighted selection primitive:
    * high-weight rows win proportionally more often, zero/negative
    * weights floor to 1e-4 (no 1/0; effectively never beating real
    * weights), uniform weights degrade to a [[groupQuota]]-style draw.
    *
    * Map-only key computation + one per-group top-n window. Keys round
    * 6dp BEFORE ranking (with the id as tiebreak) so the order — not
    * just the values — replays bit-for-bit in SQL.
    *
    * Output: (<groupCol>, <idCol>, <weightCol>, es_key, rank).
    */
  def weightedSample(df: org.apache.spark.sql.DataFrame, groupCol: String, idCol: String,
                     weightCol: String, n: Int, seed: Long = 42): org.apache.spark.sql.DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    // u in (0, 1]: 60-bit seeded hash reduced mod 1e9, shifted off zero
    val u = ((seededHash(col(idCol), seed) % 1000000000L) + 1.0) / 1000000001.0
    val w = greatest(col(weightCol).cast("double"), lit(1e-4)) // zero-weight floor
    val key = round(pow(u, lit(1.0) / w), 6)
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(col("es_key").desc, col(idCol).asc)
    df.select(col(groupCol), col(idCol), col(weightCol), key.as("es_key"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= n)
  }

  /** Mixture REALIZATION: turn [[mixtureWeights]]' temperature-scaled
    * per-group probabilities into an actual sampled corpus under a
    * total token budget — per group, budget_g = ⌊weight_g · total⌋
    * tokens, rows admitted in the deterministic hash order until the
    * budget fills (the [[tokenBudgetPack]] admission rule with a
    * per-group budget). The standard multi-domain recipe end-to-end:
    * q71 decides the proportions, this op materializes the corpus.
    *
    * Plan shape: group token masses are one partial-agg rollup
    * (|groups| rows, broadcast back); admission is ONE window sort per
    * group — no global sort, no driver loop. Weights round 6dp BEFORE
    * the budget multiply so the whole trace replays in SQL.
    *
    * Output per admitted row: (<groupCol>, <idCol>, <tokenCol>, weight,
    * budget_tokens, cum_tokens).
    */
  def mixtureRealize(df: org.apache.spark.sql.DataFrame, groupCol: String, idCol: String,
                     tokenCol: String, totalBudget: Long,
                     temperature: Double): org.apache.spark.sql.DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val perGroup = df.groupBy(groupCol).agg(sum(col(tokenCol)).as("__n"))
    val budgets = mixtureWeights(perGroup, "__n", temperature)
      .select(col(groupCol), round(col("weight"), 6).as("weight"))
      .withColumn("budget_tokens", floor(col("weight") * totalBudget).cast("long"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), 1000000000), col(idCol))
    df.join(broadcast(budgets), Seq(groupCol))
      .withColumn("cum_tokens",
        sum(col(tokenCol)).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(col("cum_tokens") - col(tokenCol) < col("budget_tokens"))
      .select(col(groupCol), col(idCol), col(tokenCol), col("weight"),
        col("budget_tokens"), col("cum_tokens"))
  }

  /** Curriculum schedule: order a SCORED corpus easy→hard for staged
    * training — stage boundaries are the exact score quantiles
    * (stage 1 = lowest scores), and within a stage documents land in
    * `(shard, pos)` slots by the seeded-hash shuffle, so consumers
    * stream stage by stage, shard by shard, with no global sort
    * anywhere (the [[shardShuffle]] layout nested under a stage key).
    *
    * Same caller-persist contract as `TextOps.perplexityBuckets`:
    * `scored` is referenced twice (quantile aggregate + projection) —
    * persist/checkpoint an expensive upstream before passing it.
    *
    * Scale shape: thresholds are `stages−1` doubles broadcast back;
    * stage assignment is a map-only when-chain; the per-(stage, shard)
    * position window never sees more than a shard of one stage.
    * Output: (<idCol>, stage 1-based, shard, pos).
    */
  def curriculumSchedule(scored: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
                         scoreCol: String = "avg_nll", stages: Int = 3,
                         shards: Int = 8, seed: Long = 42L): org.apache.spark.sql.DataFrame = {
    require(stages >= 2, s"need at least 2 stages: $stages")
    require(shards >= 1, s"need at least 1 shard: $shards")
    val th = scored.agg(
      percentile(col(scoreCol), lit(1.0 / stages)).as("__t1"),
      (2 until stages).map(j =>
        percentile(col(scoreCol), lit(j.toDouble / stages)).as(s"__t$j")): _*)
    val stageCol = (2 until stages)
      .foldLeft(when(col(scoreCol) <= col("__t1"), 1)) { (acc, j) =>
        acc.when(col(scoreCol) <= col(s"__t$j"), j)
      }
      .otherwise(stages)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stage"), col("shard")).orderBy(col("__hv"), col(idCol))
    scored.crossJoin(broadcast(th))
      .withColumn("stage", stageCol.cast("int"))
      .withColumn("__hv", seededHash(col(idCol), seed))
      .withColumn("shard", (col("__hv") % shards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("stage"), col("shard"), col("pos"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every RAW
    * document by how much its hashed-token distribution looks like a
    * small TARGET corpus, `log w(d) = Σ_tok (ln p_target(b(tok)) −
    * ln p_raw(b(tok)))` over `buckets` hashed unigram features with
    * add-1 smoothing, then select the top quarter by weight — the
    * importance-resampling recipe with the noisy Gumbel draw replaced
    * by its deterministic top-quantile limit (engine-replayable; the
    * stochastic variant just adds seeded noise to `logw`).
    *
    * Scale shape: ONE pass over the corpus builds per-(doc, bucket)
    * counts — the sufficient statistic for both halves: bucket totals
    * (model) and per-doc weighted sums (scoring, `Σ_b c_db · Δ_b` with
    * the `buckets`-row Δ table broadcast). The selection threshold is
    * ONE exact percentile broadcast back (no global sort). Per-bucket
    * delta is quantized to INTEGER micro-nats before the weighted sum
    * (a long sum is exact and summation-order-free — the double-sum
    * form split at the 4dp rounding boundary between engines) and the
    * doc weight rounds to 4dp after.
    * Output: one row per raw doc — (<idCol>, n_toks, logw, selected).
    */
  def dsirWeights(docs: org.apache.spark.sql.DataFrame, targetPred: Column,
                  idCol: String = "doc_id", textCol: String = "text",
                  buckets: Int = 256, seed: Long = 7L,
                  keepQuantile: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val toks = DedupOps.widen(docs)
      .select(col(idCol), targetPred.as("__is_target"),
        explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull)
      .withColumn("b", seededHash(col("tok"), seed) % buckets)
    // ONE corpus pass: per-(doc, bucket) counts are the sufficient
    // statistic for both the model (bucket totals) and the scoring
    // (per-doc weighted sums) — checkpointed because everything below
    // reads it (the unpersist-before-consume class, handled at birth)
    val dbc = toks.groupBy(col(idCol), col("__is_target"), col("b"))
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val counts = dbc.groupBy("b").agg(
      sum(when(col("__is_target"), col("c")).otherwise(0L)).as("ct"),
      sum(when(col("__is_target"), 0L).otherwise(col("c"))).as("cr"))
      .localCheckpoint(true) // `buckets` rows; totals + delta both read it
    val totals = counts.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    // add-1 smoothed log-ratio per bucket in INTEGER micro-nats: the
    // per-doc weight is then a sum of longs — exact and summation-
    // order-independent, where a double sum differs in the last ulp
    // between engines and splits at the 4dp rounding boundary
    // (observed: 2 of 475 docs at sf0.01 before this form)
    val delta = counts.crossJoin(totals)
      .select(col("b"), Rounding.round(
        log((col("ct") + 1) * (col("tr") + buckets)
          / ((col("cr") + 1) * (col("tt") + buckets))) * 1e6).cast("long").as("dl6"))
    val scored = dbc.filter(!col("__is_target"))
      .join(broadcast(delta), Seq("b"))
      .groupBy(idCol)
      .agg(sum(col("c")).as("n_toks"),
        Rounding.round(sum(col("c") * col("dl6")).cast("double") / 1e6, 4).as("logw"))
      .localCheckpoint(true) // one row per raw doc; threshold + output read it
    val th = scored.agg(percentile(col("logw"), lit(keepQuantile)).as("__cut"))
    scored.crossJoin(broadcast(th))
      .withColumn("selected", col("logw") >= col("__cut"))
      .drop("__cut")
  }

  /** DoReMi-lite mixture reweighting: per-source sampling weights that
    * BOOST the sources the reference LM finds hard (excess token-
    * weighted surprisal over the corpus mean — the multiplicative-
    * weights signal of DoReMi, one step, exponentiated at `eta`) on
    * top of their token share. The learned-mixture counterpart of
    * q71's temperature heuristic.
    *
    * Input is the SCORED frame — (source, n_tokens, avg_nll) per doc,
    * i.e. [[graft.ops.TextOps.unigramLogProb]] joined back to sources —
    * so the expensive LM pass is the caller's (persist contract as
    * q104). Determinism: per-source nll mass banks as exact integers
    * (avg_nll is 4dp by contract), excess re-rounds to 4dp before the
    * exp, raw weights bank at 1e-6 before normalizing — the share
    * division is exact-long / exact-long.
    *
    * Output per source: (source, n_docs, token_share, mean_nll,
    * excess, boost, weight); weights sum to 1 ± 1e-6.
    */
  def doremiWeights(scored: org.apache.spark.sql.DataFrame, eta: Double = 1.0,
                    srcCol: String = "source"): org.apache.spark.sql.DataFrame = {
    val per = scored.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("__tok"),
        sum(round(col("avg_nll") * 1e4).cast("long") * col("n_tokens")).as("__nll4"))
      .localCheckpoint(true) // corpus totals + the weight pass both read it
    val tot = per.agg(sum("__tok").as("__tt"), sum("__nll4").as("__tn"))
    val w = per.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_docs"),
        round(col("__tok") / col("__tt").cast("double"), 6).as("token_share"),
        round(col("__nll4") / col("__tok").cast("double") / 1e4, 4).as("mean_nll"),
        round(col("__tn") / col("__tt").cast("double") / 1e4, 4).as("__corpus"))
      .withColumn("excess", round(greatest(col("mean_nll") - col("__corpus"), lit(0.0)), 4))
      .withColumn("boost", round(exp(lit(eta) * col("excess")), 6))
      .withColumn("__w6", round(col("token_share") * col("boost") * 1e6).cast("long"))
      .localCheckpoint(true) // the normalizer + the output both read it
    val norm = w.agg(sum("__w6").as("__sw"))
    w.crossJoin(broadcast(norm))
      .select(col(srcCol), col("n_docs"), col("token_share"), col("mean_nll"),
        col("excess"), col("boost"),
        round(col("__w6") / col("__sw").cast("double"), 6).as("weight"))
  }

  /** Neyman allocation of an eval/annotation budget: stratum sample
    * sizes ∝ n_h·σ_h — minimum-variance allocation for estimating the
    * corpus mean of `valueCol` (strata with more mass OR more internal
    * spread earn more labels). The statistical-sampling-design
    * counterpart of the proportional q86 split.
    *
    * Determinism: values bank to exact 1e-4 integers; n·σ reduces to
    * √(n·Σx² − (Σx)²)/1e4 — one sqrt (correctly rounded IEEE, safe
    * cross-engine, unlike ln/exp) of an exact long, banked at 1e-3;
    * the allocation itself is exact integer arithmetic with
    * largest-remainder rounding (ties to the smaller stratum name), so
    * Σ alloc = `total` exactly, in any engine.
    *
    * Output per stratum: (<groupCol>, n_rows, sigma, alloc).
    */
  def neymanAllocation(scored: org.apache.spark.sql.DataFrame, groupCol: String,
                       valueCol: String, total: Int = 1000): org.apache.spark.sql.DataFrame = {
    val x4 = round(col(valueCol) * 1e4).cast("long")
    val per = scored.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(x4).as("__sx"), sum(x4 * x4).as("__sxx"))
      // n·Σx² − (Σx)² in decimal: the long product overflows past ~3·10⁵
      // rows/stratum at 1e-4 banking (DuckDB side is hugeint-exact)
      .select(col(groupCol), col("n_rows"),
        (col("n_rows").cast("decimal(38,0)") * col("__sxx").cast("decimal(38,0)")
          - col("__sx").cast("decimal(38,0)") * col("__sx").cast("decimal(38,0)")).as("__num"))
      .select(col(groupCol), col("n_rows"),
        round(sqrt(col("__num").cast("double")) / col("n_rows") / 1e4, 6).as("sigma"),
        round(sqrt(col("__num").cast("double")) * 1e3).cast("long").as("__w3"))
      .localCheckpoint(true) // normalizer + the allocation pass both read it
    val tot = per.agg(sum("__w3").as("__sw"))
    def intDiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val alloc = per.crossJoin(broadcast(tot))
      .withColumn("__floor", intDiv(lit(total.toLong) * col("__w3"), col("__sw")))
      .withColumn("__rem", pmod(lit(total.toLong) * col("__w3"), col("__sw")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(groupCol).asc)
    // strata count is bounded (categories), so the remainder ranking
    // window is a driver-scale sort, not a corpus one
    alloc
      .withColumn("__rk", row_number().over(w))
      .withColumn("__extra",
        sum("__floor").over(org.apache.spark.sql.expressions.Window
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(col(groupCol), col("n_rows"), col("sigma"),
        (col("__floor") + when(col("__rk") <= lit(total.toLong) - col("__extra"), 1L)
          .otherwise(0L)).cast("long").as("alloc"))
  }

  /** Data-funnel report over a curation verdict frame (doc_id, reason,
    * keep): docs and tokens surviving each gate — the one-page answer
    * to "where did my corpus go?". The per-reason rollup reads the
    * curated frame ONCE; the 4-row result is checkpointed because the
    * totals and the share projection both read it.
    *
    * Output per reason: (reason, n_docs, n_tokens, doc_share,
    * token_share).
    */
  def dataFunnel(curated: org.apache.spark.sql.DataFrame,
                 docTokens: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val per = curated.join(docTokens, Seq("doc_id"), "left")
      .groupBy("reason")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_tokens"), lit(0L))).as("n_tokens"))
      .localCheckpoint(true) // totals + shares both read the tiny rollup
    val tot = per.agg(sum("n_docs").as("__td"), sum("n_tokens").as("__tt"))
    per.crossJoin(broadcast(tot))
      .select(col("reason"), col("n_docs"), col("n_tokens"),
        round(col("n_docs") / col("__td").cast("double"), 6).as("doc_share"),
        round(col("n_tokens") / col("__tt").cast("double"), 6).as("token_share"))
  }
}
