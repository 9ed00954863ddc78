package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** Stable bucket in [0, buckets) from the id's md5 prefix. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

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

  /** Greedy token-budget packing: per group (source, domain, shard),
    * admit documents in hash order until the group's cumulative token
    * count reaches `budget` — the deterministic "assemble N tokens per
    * source" step of corpus construction. The first doc crossing the
    * budget is still admitted (its tokens were needed to reach it), so
    * every group with data reaches its budget; membership is stable
    * because the order is the [[hashBucket]] order, never file layout.
    * One window sort per group — the same shape and cost as
    * [[groupQuota]]. Output: input columns + cumulative token count.
    */
  def tokenBudgetPack(df: org.apache.spark.sql.DataFrame, groupCol: String,
                      idCol: String, tokenCol: String, budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), 1000000000), col(idCol))
    df.withColumn("cum_tokens",
        sum(col(tokenCol)).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(col("cum_tokens") - col(tokenCol) < budget)
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
}
