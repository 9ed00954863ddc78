package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev aid: 10× scale-up stress for the operators whose cost model
  * depends on corpus growth, not just row count (SCALE.md's stress
  * entries). Replicates the sf0.1 documents/embeddings tables 10× with
  * per-copy perturbation (every doc/vector gains 9 near-dups — the
  * worst case for candidate density), then times the scale-sensitive
  * paths A/B. `runMain graft.Stress [semdedup|pack|all]`.
  */
object Stress {
  /** Task-level spill/duration counters fed by one SparkListener;
    * `reset()` between timed queries, read after a listener-bus drain.
    * One instance per session — shared by the scale7/scale8 loops so
    * the measurement harness exists exactly once.
    */
  private final class TaskMetricsProbe(sc: org.apache.spark.SparkContext) {
    val spillB = new java.util.concurrent.atomic.AtomicLong
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          spillB.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
          nTasks.incrementAndGet()
          val rt = te.taskInfo.duration
          var cur = maxTaskMs.get()
          while (rt > cur && !maxTaskMs.compareAndSet(cur, rt)) cur = maxTaskMs.get()
        }
      }
    })
    def reset(): Unit = { spillB.set(0); maxTaskMs.set(0); nTasks.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val which = args.headOption.getOrElse("all")
    val x = args.drop(1).headOption.map(_.toInt).getOrElse(10) // scale multiplier

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    if (which == "semdedup" || which == "all") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      (0 until x).map { i =>
        emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          transform(col("embedding"), e => e + lit(0.001f * i)).as("embedding"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet("/tmp/graft_stress_emb10")
      val emb10 = spark.read.parquet("/tmp/graft_stress_emb10")
      val n10 = emb10.count()
      import graft.ops.SimilarityOps
      def pairStats(out: DataFrame): (Double, Long) =
        out.groupBy("cell").count()
          .select(sum(col("count") * (col("count") - 1) / 2).as("p"), max("count").as("mx"))
          .as[(Double, Long)].head()
      val (outF, tF) = time { val o = SimilarityOps.semDedup(emb10, k = 8); o.count(); o }
      val (pF, mxF) = pairStats(outF)
      val (outA, tA) = time { val o = SimilarityOps.semDedup(emb10, targetCellRows = 1024); o.count(); o }
      val (pA, mxA) = pairStats(outA)
      println(f"STRESS_SEMDEDUP n=$n10 k8_time=$tF%.1fs k8_cellpairs=$pF%.3e k8_maxcell=$mxF " +
        f"autok=${SimilarityOps.semDedupK(n10, 1024)} auto_time=$tA%.1fs auto_cellpairs=$pA%.3e auto_maxcell=$mxA")
    }

    // r15 (round-14 verdict #9): scaling exponent of the r14/r15
    // native byte-walk families on a ×x corpus — the per-row wins are
    // map-only, so wall time should track rows ~linearly (exponent ≈ 1
    // on log-ratio); anything super-linear would mean a hidden
    // corpus-sized shuffle crept into the "map-only" paths.
    if (which == "walks") {
      import graft.ops.{TextOps, UrlOps}
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source", "text")
      val docsX = (0 until x).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("source"), col("text"))
      }.reduce(_ unionByName _)
      docsX.write.mode("overwrite").parquet("/tmp/graft_stress_walks")
      val big = spark.read.parquet("/tmp/graft_stress_walks")
      def noopTime(df: DataFrame): Double =
        time(df.write.format("noop").mode("overwrite").save())._2
      def run(label: String, f: DataFrame => DataFrame): Unit = {
        noopTime(f(docs)) // warm both shapes (codegen, page cache)
        noopTime(f(big))
        val t1 = noopTime(f(docs))
        val tX = noopTime(f(big))
        val exp = math.log(tX / t1) / math.log(x.toDouble)
        println(f"STRESS_WALKS $label x$x base=$t1%.2fs big=$tX%.2fs exponent=$exp%.2f")
      }
      run("html_extract", d => TextOps.htmlExtract(graft.OpsEntries.htmlFixture(d)))
      run("url_normalize", d => UrlOps.urlNormalize(graft.OpsEntries.urlFixture(d)))
    }

    if (which == "pack" || which == "all") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until x).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("source"), col("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet("/tmp/graft_stress_docs10")
      import graft.ops.{SampleOps, TextOps}
      // carry the text: the production shape packs DOCUMENTS, so the
      // window sort shuffles full rows — the volume the pre-filter cuts
      val base = spark.read.parquet("/tmp/graft_stress_docs10")
        .select(col("source"), col("doc_id"), col("text"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .persist()
      base.count()
      // ratio 32 = the pre-round-6 default; the library default is now
      // lazy (Infinity), so the cut arm opts in explicitly
      def pack(margin: Double): DataFrame =
        SampleOps.tokenBudgetPack(base, "source", "doc_id", "n_tokens", 800L, margin,
          preFilterEngageRatio = 32.0)
      val (rNew, tNew) = time(pack(4.0).count())
      val (rOld, tOld) = time(pack(1e12).count()) // margin→∞ disables the cut
      val same = pack(4.0).select("doc_id").as[Long].collect().toSet ==
        pack(1e12).select("doc_id").as[Long].collect().toSet
      // rows entering the per-source window sort (the single-task-per-
      // group concentration the pre-filter exists to bound), measured
      // with the ENGINE's own cut predicate so the numbers can't drift
      val sortInput = SampleOps.packSuperset(base,
        SampleOps.packStats(base, "source", "n_tokens"),
        "source", "doc_id", 800L, 4.0).count()
      val biggest = base.groupBy("source").count().agg(max("count")).as[Long].head()
      println(f"STRESS_PACK rows=${base.count()} prefilter_time=$tNew%.2fs " +
        f"full_time=$tOld%.2fs rows_new=$rNew rows_old=$rOld identical=$same " +
        f"sort_input=$sortInput biggest_group=$biggest")
    }
    // Skewed embedding space: 70% of the ×x corpus collapses onto one
    // content cluster — the case where k(n) alone cannot bound the
    // worst cell. A/B the flat pass vs semDedupAdaptive (refined pair
    // work and max group are what must shrink).
    if (which == "skew" || which == "all") {
      import graft.ops.SimilarityOps
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      (0 until x).map { i =>
        val shifted = emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"))
        if (i % 10 < 7) // 7 of 10 copies: near-identical cluster vectors
          shifted.select(col("vec_id"),
            array_repeat(lit(1.0f) + (col("vec_id") % 1000).cast("float") * 1e-6f, 64)
              .as("embedding"))
        else shifted
      }.reduce(_ unionByName _).write.mode("overwrite").parquet("/tmp/graft_stress_skew")
      val sk = spark.read.parquet("/tmp/graft_stress_skew")
      def groupStats(df: DataFrame, keys: String*): (Double, Long) =
        df.groupBy(keys.map(col): _*).count()
          .select(sum(col("count") * (col("count") - 1) / 2).as("p"), max("count").as("mx"))
          .as[(Double, Long)].head()
      val (flat, tF) = time { val o = SimilarityOps.semDedup(sk, targetCellRows = 1024); o.count(); o }
      val (pF, mxF) = groupStats(flat, "cell")
      val (ad, tA) = time { val o = SimilarityOps.semDedupAdaptive(sk,
        targetCellRows = 1024, oversizeFactor = 4); o.count(); o }
      val (pA, mxA) = groupStats(ad, "cell", "subcell")
      println(f"STRESS_SKEW n=${sk.count()} flat_time=$tF%.1fs flat_pairs=$pF%.3e flat_maxcell=$mxF " +
        f"adaptive_time=$tA%.1fs adaptive_pairs=$pA%.3e adaptive_maxgroup=$mxA")
    }

    // q92: per-series Holt-Winters fold under ×x SERIES COUNT (the
    // growth axis at 100 TB — more metrics, not longer histories, W2
    // step coarsening bounds points-per-series). Expect ~linear time.
    if (which == "hw" || which == "all") {
      import graft.ops.SeriesOps
      val nSeries = 3000 * x; val nBuckets = 120
      val df = spark.range(nSeries.toLong * nBuckets).select(
        concat(lit("m"), col("id") % nSeries).as("event_type"),
        (lit(1700000000L) + (col("id") / nSeries) * 3600L).as("bucket_ts"),
        round(sin(col("id").cast("double") / 7.0) * 10 + 50, 4).as("v"))
      val (n, t) = time(SeriesOps.holtWinters(df, 0.25, 0.125, 0.25, 24,
        "event_type", "bucket_ts", "v").queryExecution.toRdd.count())
      println(f"STRESS_HW series=$nSeries buckets=$nBuckets out_rows=$n time=$t%.2fs")
    }

    // q93: duplicated-position DENSITY worst case — x identical copies
    // of every doc make EVERY window duplicated, so the per-doc span
    // window sees all positions, and the count shuffle carries x× rows.
    // Times both shuffle modes (string vs coded 8-byte keys).
    if (which == "substr" || which == "all") {
      import graft.ops.TextOps
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until x).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet("/tmp/graft_stress_substr")
      val d10 = spark.read.parquet("/tmp/graft_stress_substr")
      val (ns, tS) = time(TextOps.exactSubstrSpans(d10).queryExecution.toRdd.count())
      val (nc, tC) = time(TextOps.exactSubstrSpans(d10, codedKeys = true).queryExecution.toRdd.count())
      println(f"STRESS_SUBSTR docs=${d10.count()} string_time=$tS%.2fs coded_time=$tC%.2fs out=$ns/$nc")
    }

    // Full-corpus distributed suffix array: the oracle entries (q113/
    // q114) run on the doc_id<120 slice so DuckDB can replay them; this
    // mode runs the SAME operators over the WHOLE sf corpus (where the
    // single-task suffixArraySpans cannot go) and records time + the
    // aggregate dup mass, A/B'd against the window screen.
    if (which == "sa") {
      import graft.ops.{SuffixArrayOps, TextOps}
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      // `Stress sa N` (N > 1) replicates ×N: doubling rounds stay at
      // ceil(log2(longest DOC)) — corpus growth must cost linearly.
      // Default 1 (NOT the shared ×10): the base record reads sfDir as-is
      val saX = args.drop(1).headOption.map(_.toInt).getOrElse(1)
      val docs = if (saX <= 1) base else {
        (0 until saX).map { i =>
          base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"))
        }.reduce(_ unionByName _).write.mode("overwrite").parquet("/tmp/graft_stress_sa")
        spark.read.parquet("/tmp/graft_stress_sa")
      }
      val stats = docs.filter(col("text").isNotNull)
        .select(size(TextOps.tokens(col("text"))).as("nt"))
        .agg(count(lit(1)), sum("nt"), max("nt")).head()
      val (spans, tSA) = time(SuffixArrayOps.saSpans(docs).localCheckpoint(true))
      val agg = spans.agg(sum("covered_tokens"), max("max_dup_tokens"),
        sum(when(col("n_spans") > 0, 1L).otherwise(0L))).head()
      val (_, tScreen) = time(TextOps.exactSubstrSpans(docs).queryExecution.toRdd.count())
      println(f"STRESS_SA docs=${stats.getLong(0)} total_tokens=${stats.get(1)} " +
        f"max_doc_tokens=${stats.get(2)} sa_time=$tSA%.1fs screen_time=$tScreen%.2fs " +
        f"covered=${agg.get(0)} maxdup=${agg.get(1)} docs_with_spans=${agg.get(2)}")
    }

    // Scale-exponent record for the suite's five heaviest ENTRIES, run
    // unmodified against a ×x (default ×10 ≈ sf1) replica corpus laid
    // out as a real table dir — documents + embeddings with per-copy
    // perturbation, ids offset so auto-k policies see the true n. Per
    // query and scale: wall time, shuffle-spill bytes, task count, max
    // single-task time (the skew proxy), with AQE + skew-join ON. The
    // printed exponent log_x(t_x / t_1) is the evidence SCALE.md's
    // 100 TB claims cite: ~1.0 = linear, ≫1 = a plan that would not
    // survive the next order of magnitude.
    if (which == "scale" || which == "scale7" || which == "scale7b" || which == "scale7c" || which == "scale7d") {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val scaleDir = "/tmp/graft_scale_x" + x
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until x).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$scaleDir/documents.parquet")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      (0 until x).map { i =>
        emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          transform(col("embedding"), e => e + lit(0.001f * i)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$scaleDir/embeddings.parquet")
      if (which == "scale7b" || which == "scale7c" || which == "scale7d") {
        // events replica for the behavioral family: user ids offset per
        // copy so the user population grows ×x with per-user structure
        // (event order, sessions, funnels) preserved
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
        (0 until x).map { i =>
          ev.withColumn("user_id", col("user_id") + lit(i.toLong * 1000000L))
            .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
        }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$scaleDir/events.parquet")
      }

      val probe = new TaskMetricsProbe(spark.sparkContext)
      // scale7: the round-7 additions whose cost depends on corpus
      // growth — identical ×10 copies make EVERY doc a 10-way dup, so
      // candidate-pair queries (q128/q143) face ~100× pair density
      val heavy =
        if (which == "scale7")
          Seq("q128_edit_verify", "q143_containment", "q132_bm25_topk",
            "q134_nb_classify", "q140_kl_divergence", "q118_line_dedup",
            "q136_data_card", "q142_semantic_layout")
        // scale7b: the third-phase additions — identical ×10 doc copies
        // make candidate-pair work (q159/q165/q174/q175) ~100×, the
        // logreg gate sees 10× feature rows, and the events replica
        // gives the behavioral family ×10 users
        else if (which == "scale7b")
          Seq("q156_logreg_train", "q159_tfidf_cosine", "q165_dup_triangles",
            "q174_dup_kcore", "q175_curation_pipeline", "q162_window_funnel",
            "q171_mad_outliers", "q172_event_trigrams")
        // scale7c: the sketch/diagnostic additions — register tables and
        // moment aggregates must stay flat as rows grow; q213 faces the
        // ~100x component/pair density of the 10-way-clone corpus
        else if (which == "scale7c")
          Seq("q205_matched_pairs", "q212_sequence_match", "q216_rolling_hll",
            "q206_hll_distinct", "q207_countmin_audit", "q213_cv_folds",
            "q217_keyframes", "q209_pca_top")
        // scale7d: the analytics/LM/search additions — TWA/decay/KN are
        // row-linear, containment/weighted-jaccard face the shared-term
        // join, waterfill/heaps are category-sized after one pass
        else if (which == "scale7d")
          Seq("q218_time_weighted_avg", "q221_decay_score", "q224_waterfill_mix",
            "q226_trigram_search", "q227_pct_normalize", "q229_source_containment",
            "q230_kneser_ney", "q233_weighted_jaccard", "q236_heaps_law")
        else Seq("q100_semdedup_skew", "q97_semdedup_autok", "q75_semdedup",
          "q84_bigram_logprob", "q101_ann_recall")
      // one untimed warm pass at base scale amortizes codegen/JIT; the
      // ×x pass is dominated by real work, so a single timed run per
      // (query, scale) is the honest affordable protocol (noted in
      // SCALE.md; sub-second noise is irrelevant at these durations)
      heavy.foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
      Seq(("base", sfDir), (s"x$x", scaleDir)).foreach { case (tag, dir) =>
        heavy.foreach { q =>
          probe.reset()
          val (rows, t) = time(SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count())
          Thread.sleep(500) // let the listener bus drain before reading
          println(f"STRESS_SCALE scale=$tag query=$q rows=$rows time=$t%.2fs " +
            f"spill_bytes=${probe.spillB.get()} tasks=${probe.nTasks.get()} " +
            f"max_task_ms=${probe.maxTaskMs.get()}")
        }
      }
    }

    // scale8: ORGANIC-SKEW ×x replica. scale7's uniform 10-way clones
    // preserve uniformity; real lakes are Zipf-skewed in doc/source/
    // shingle multiplicity. Here every base row draws its copy count
    // from a truncated Zipf(s=1.75, 1..300) via inverse-CDF on a
    // seeded hash (deterministic; mean ≈ x for x=10 — recorded, not
    // assumed), so a head doc becomes a ~300-way dup CLIQUE: band
    // buckets, shingle df, k-core degrees and source masses all go
    // heavy-tailed at once. AQE + skew-join ON; per query we record
    // time, spill, max task, and the AQE skew-split counts pulled from
    // the executed plan — the direct evidence the skew machinery fired.
    // zipftext: the same organic-skew corpus, pointed at the heavy TEXT
    // family — identical-document cliques (297-way at the head) are the
    // worst case for suffix-array prefix doubling (maximal rank-tie
    // runs) and duplicated-span sweeps. zipfcompact: the rollup/dedup
    // compaction rewrite over the Zipf events table, with the read
    // contracts checked pre/post (the CompactionEquivalenceSpec claim,
    // re-proven at x10 organic skew and TIMED).
    if (which == "scale8" || which == "zipftext" || which == "zipfcompact") {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled to the test corpus: the default skew trigger
      // (256 MB skewed partition, 5x median) needs multi-GB shuffles —
      // at ~50 MB total the RATIO structure is identical but absolute
      // sizes never reach it. 64k/32k keeps factor-5 detection
      // semantics while making the 100 TB skew-split behavior
      // observable at test scale; 1 MB scan splits stand in for the
      // many-file splits a real lake scan gets (a single /tmp parquet
      // otherwise reads as 4 tasks and every map stage LOOKS serial).
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
      import graft.ops.SampleOps
      val zipfDir = "/tmp/graft_scale_zipf"
      val sExp = 1.75; val mMax = 300
      val wts = (1 to mMax).map(m => math.pow(m, -sExp))
      val cdf = wts.scanLeft(0.0)(_ + _).tail.map(_ / wts.sum)
      val cdfArr = array(cdf.map(lit): _*)
      def mult(id: org.apache.spark.sql.Column, seed: Long) = {
        val u = (SampleOps.seededHash(id, seed) % 1000000000L).cast("double") / 1e9
        size(filter(cdfArr, c => c < u)) + 1
      }
      // v2 layout protocol: EVERY table the timed set reads is written
      // as a 32-file layout — the Zipf replica AND an untouched base
      // copy — so scan parallelism matches a many-file lake scan on
      // both arms and base/zipf differ ONLY in content. A single /tmp
      // parquet otherwise caps its map stage at the file's row-group
      // count regardless of maxPartitionBytes (splits beyond a
      // row-group start read zero rows): q226's corpus scan ran as 4
      // tasks with a 15 s straggler that was pure LAYOUT, not skew.
      val baseDir = "/tmp/graft_scale_zipf_base"
      // documents: copy c of doc d -> c·10M + d; copies keep the text
      // verbatim (dup cliques), source rides along so source masses skew
      if (which != "zipfcompact") {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        docs.repartition(32)
          .write.mode("overwrite").parquet(s"$baseDir/documents.parquet")
        docs.withColumn("__m", mult(col("doc_id"), 0xA11CEL))
          .withColumn("__c", explode(sequence(lit(0), col("__m") - 1)))
          .withColumn("doc_id", col("__c").cast("long") * 10000000L + col("doc_id"))
          .drop("__m", "__c")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$zipfDir/documents.parquet")
      }
      // embeddings: copies perturb by a 1e-4·copy first-dim ramp —
      // NEAR-dup clusters of Zipf size (the semdedup/IVF cell stress)
      if (which == "scale8") {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        emb.repartition(32)
          .write.mode("overwrite").parquet(s"$baseDir/embeddings.parquet")
        emb.withColumn("__m", mult(col("vec_id"), 0xBEEFL))
          .withColumn("__c", explode(sequence(lit(0), col("__m") - 1)))
          .select((col("__c").cast("long") * 10000000L + col("vec_id")).as("vec_id"),
            concat(
              array((element_at(col("embedding"), 1)
                + col("__c").cast("float") * 1e-4f).cast("float")),
              slice(col("embedding"), 2, 63)).as("embedding"),
            col("label"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$zipfDir/embeddings.parquet")
      }
      // events: the multiplicity draws on USER_ID and the copies KEEP
      // the user id — a head user's history multiplies ×m (up to ×300),
      // the heavy-key stress for user-keyed windows (funnel, matched
      // pairs, TWA state). event_id offsets per copy keep tie-break
      // totality; ts shifts +c seconds so copies are distinct events,
      // not duplicate rows a dedup would fold.
      if (which != "zipftext") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
        // ts is either raw nanos (long) or TIMESTAMP_NTZ depending on how
        // the session read the footer — shift by __c seconds in whichever
        // arithmetic the type supports (the SparkEntry.events discipline).
        val tsShift = ev.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            col("ts") + col("__c").cast("long") * 1000000000L
          case _ => expr("timestampadd(SECOND, __c, ts)")
        }
        ev.repartition(32)
          .write.mode("overwrite").parquet(s"$baseDir/events.parquet")
        ev.withColumn("__m", mult(col("user_id"), 0x5EEDL))
          .withColumn("__c", explode(sequence(lit(0), col("__m") - 1)))
          .withColumn("event_id", col("__c").cast("long") * 100000000L + col("event_id"))
          .withColumn("ts", tsShift)
          .drop("__m", "__c")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$zipfDir/events.parquet")
      }

      val probe = new TaskMetricsProbe(spark.sparkContext)
      // AQE skew evidence: sum numSkewedPartitions/numSkewedSplits over
      // the EXECUTED adaptive plan (AQEShuffleReadExec carries them)
      def skewStats(qe: org.apache.spark.sql.execution.QueryExecution): (Long, Long) = {
        import org.apache.spark.sql.execution.SparkPlan
        var sp = 0L; var ss = 0L
        def walk(p: SparkPlan): Unit = {
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan)
            case _ => ()
          }
          p.metrics.foreach { case (k, m) =>
            if (k == "numSkewedPartitions") sp += m.value
            if (k == "numSkewedSplits") ss += m.value
          }
          p.children.foreach(walk)
        }
        walk(qe.executedPlan); (sp, ss)
      }
      // Composite entries (q202) run their heavy joins inside eager
      // localCheckpoint executions BEFORE the returned frame's plan, so
      // walking only the final QueryExecution misses them. A
      // QueryExecutionListener sees every Dataset action (checkpoint
      // included) — accumulate those, then add the final frame's own
      // plan (toRdd.count() is a raw RDD action the listener never sees).
      val ckptSkewP = new java.util.concurrent.atomic.AtomicLong
      val ckptSkewS = new java.util.concurrent.atomic.AtomicLong
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
          val (p, s) = skewStats(qe)
          ckptSkewP.addAndGet(p); ckptSkewS.addAndGet(s)
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      })
      // the heavy pair/graph set + the exact-tier slice: the q185
      // contract runs on ~50 BASE docs, which under Zipf replication
      // means every surviving copy — head cliques included
      val sliceFilter = (col("doc_id") % 10000000L) < 50
      // zipftext: q113/q114's oracle entries filter doc_id < 120, which
      // under copy-offset ids keeps only copy 0 — the slice here keys
      // on the BASE id (the q185 convention), so the 297-way head
      // cliques land whole inside the suffix array: identical documents
      // produce maximal rank-tie runs in prefix doubling, the exact
      // regime the uniform ×10 record never touches.
      val slice120 = (col("doc_id") % 10000000L) < 120
      val label = if (which == "zipftext") "STRESS_ZIPFTEXT" else "STRESS_ZIPF"
      val named: Seq[(String, String => DataFrame)] =
        if (which == "zipfcompact") Seq.empty
        else if (which == "zipftext") Seq(
          "q76_dup_spans" -> (d => SparkEntry.queries("q76_dup_spans")(spark, d)),
          "q93_exact_substr" -> (d => SparkEntry.queries("q93_exact_substr")(spark, d)),
          "q102_dup_span_removal" -> (d => SparkEntry.queries("q102_dup_span_removal")(spark, d)),
          "q128_edit_verify" -> (d => SparkEntry.queries("q128_edit_verify")(spark, d)),
          "q113_slice_suffix_array" -> (d => graft.ops.SuffixArrayOps.suffixArray(
            spark.read.parquet(s"$d/documents.parquet").filter(slice120))),
          "q114_slice_sa_spans" -> (d => graft.ops.SuffixArrayOps.saSpans(
            spark.read.parquet(s"$d/documents.parquet").filter(slice120))))
        else Seq(
          "q21_minhash_lsh" -> (d => SparkEntry.queries("q21_minhash_lsh")(spark, d)),
          "q100_semdedup_skew" -> (d => SparkEntry.queries("q100_semdedup_skew")(spark, d)),
          "q174_dup_kcore" -> (d => SparkEntry.queries("q174_dup_kcore")(spark, d)),
          "q226_trigram_search" -> (d => SparkEntry.queries("q226_trigram_search")(spark, d)),
          "q227_pct_normalize" -> (d => SparkEntry.queries("q227_pct_normalize")(spark, d)),
          "q185_slice_ppjoin" -> (d => graft.ops.DedupOps.ppJoinExact(
            spark.read.parquet(s"$d/documents.parquet").filter(sliceFilter))),
          "q202_corpus_build" -> (d => SparkEntry.queries("q202_corpus_build")(spark, d)),
          // heavy-USER arm: user-keyed window state under ×m histories
          "q162_window_funnel" -> (d => SparkEntry.queries("q162_window_funnel")(spark, d)),
          "q170_funnel_report" -> (d => SparkEntry.queries("q170_funnel_report")(spark, d)),
          "q205_matched_pairs" -> (d => SparkEntry.queries("q205_matched_pairs")(spark, d)),
          "q218_time_weighted_avg" -> (d => SparkEntry.queries("q218_time_weighted_avg")(spark, d)))
      named.foreach { case (_, fn) => // warm pass at base scale
        try fn(baseDir).queryExecution.toRdd.count() catch { case _: Throwable => () }
      }
      if (which == "scale8") {
        val nzd = spark.read.parquet(s"$zipfDir/documents.parquet").count()
        val nze = spark.read.parquet(s"$zipfDir/embeddings.parquet").count()
        val topClique = spark.read.parquet(s"$zipfDir/documents.parquet")
          .groupBy(col("doc_id") % 10000000L).count().agg(max("count")).as[Long].head()
        val nev = spark.read.parquet(s"$zipfDir/events.parquet").count()
        val topUser = spark.read.parquet(s"$zipfDir/events.parquet")
          .groupBy("user_id").count().agg(max("count")).as[Long].head()
        val topUserBase = spark.read.parquet(s"$sfDir/events.parquet")
          .groupBy("user_id").count().agg(max("count")).as[Long].head()
        println(s"STRESS_ZIPF corpus docs=$nzd emb=$nze top_clique=$topClique " +
          s"events=$nev top_user_events=$topUser base_top_user=$topUserBase")
      } else if (which == "zipftext") {
        val zd = spark.read.parquet(s"$zipfDir/documents.parquet")
        val nzd = zd.count()
        val topClique = zd.groupBy(col("doc_id") % 10000000L).count()
          .agg(max("count")).as[Long].head()
        val sliceDocs = zd.filter(slice120).count()
        println(s"STRESS_ZIPFTEXT corpus docs=$nzd top_clique=$topClique " +
          s"slice120_docs=$sliceDocs")
      }
      Seq(("base", baseDir), ("zipf", zipfDir)).foreach { case (tag, dir) =>
        named.foreach { case (q, fn) =>
          probe.reset(); ckptSkewP.set(0); ckptSkewS.set(0)
          // construction INSIDE the timer: composite entries checkpoint
          // eagerly, so plan construction IS most of their work
          var df: DataFrame = null
          val (rows, t) = time { df = fn(dir); df.queryExecution.toRdd.count() }
          Thread.sleep(500) // let the listener bus drain before reading
          val (sp, ss) = skewStats(df.queryExecution)
          println(f"$label scale=$tag query=$q rows=$rows time=$t%.2fs " +
            f"spill_bytes=${probe.spillB.get()} tasks=${probe.nTasks.get()} " +
            f"max_task_ms=${probe.maxTaskMs.get()} " +
            f"skew_parts=${sp + ckptSkewP.get()} skew_splits=${ss + ckptSkewS.get()}")
        }
      }

      // zipfcompact: time the at-rest rewrite over the organically
      // skewed events table and re-check the read contracts the
      // CompactionEquivalenceSpec pins at sf0.001 — here the head
      // user's metrics fold ~200 points per (metric, hour) bucket, the
      // heavy-key rollup case, and the rewrite cost gets a number.
      if (which == "zipfcompact") {
        import graft.jobs.Compaction
        import graft.retention.{RetentionResolver, RetentionRule}
        val resolver = new RetentionResolver(Seq(
          RetentionRule("^click\\.", isDefault = false, "avg", Seq(0 -> 3600)),
          RetentionRule("^error\\.", isDefault = false, "last", Seq(0 -> 3600)),
          RetentionRule(".*", isDefault = true, "avg", Seq(0 -> 3600))))
        val comp = new Compaction(resolver)
        val nowMs = 1893456000000L // 2030-01-01: every partition is aged
        def dedupPts(df: DataFrame): DataFrame =
          df.groupBy("metric", "timestamp")
            .agg(max_by(col("value"), col("updated")).as("value"),
              max("updated").as("updated"))
        Seq(("base", baseDir), ("zipf", zipfDir)).foreach { case (tag, dir) =>
          // updated stays LONG: zipf copies offset event_id by c·1e8
          // (up to 3e10) — an int cast overflows on the head copies
          val pts = SparkEntry.events(spark, dir).select(
            concat(col("event_type"), lit(".u"), col("user_id")).as("metric"),
            col("value"), col("sec").cast("int").as("timestamp"),
            to_date(from_unixtime(col("sec"))).as("date"),
            col("event_id").as("updated"))
          val root = s"/tmp/graft_zipf_compact_$tag"
          pts.write.mode("overwrite").partitionBy("date").parquet(root)
          def table(): DataFrame = spark.read.parquet(root)
          val nRaw = table().count()
          val preAvg = dedupPts(table())
            .filter(col("metric").startsWith("click."))
            .groupBy(col("metric"),
              (col("timestamp") - col("timestamp") % 3600).cast("int").as("ts"))
            .agg(avg("value").as("value")).localCheckpoint(true)
          val preLast = graft.query.MetricQuery
            .rollup(table().filter(col("metric").startsWith("error.")), "last", 86400)
            .localCheckpoint(true)
          probe.reset()
          val (done, tRw) = time(
            comp.run(spark, root, ageDays = 0, step = 3600, nowMillis = nowMs))
          val nPost = table().count()
          val postAvg = dedupPts(table())
            .filter(col("metric").startsWith("click."))
            .groupBy(col("metric"),
              (col("timestamp") - col("timestamp") % 3600).cast("int").as("ts"))
            .agg(avg("value").as("__value"))
          val avgDrift = preAvg.join(postAvg, Seq("metric", "ts"), "full_outer")
            .agg(max(abs(coalesce(col("value"), lit(Double.MaxValue))
              - coalesce(col("__value"), lit(Double.MinValue))))).as[Double].head()
          val postLast = graft.query.MetricQuery
            .rollup(table().filter(col("metric").startsWith("error.")), "last", 86400)
          val lastDiff = preLast.except(postLast).count() + postLast.except(preLast).count()
          println(f"STRESS_COMPACT scale=$tag parts=${done.size} rows_pre=$nRaw " +
            f"rows_post=$nPost rewrite=$tRw%.2fs avg_drift=$avgDrift%.3e " +
            f"last_mismatch_rows=$lastDiff spill_bytes=${probe.spillB.get()} " +
            f"max_task_ms=${probe.maxTaskMs.get()}")
        }
      }
    }

    // Round-8 ops at ×x: the BT games aggregation, silhouette's O(n·k)
    // distance join, the conformal histogram and the all-but-the-top
    // transform are all row-linear by design — the exponent
    // log10(t_x/t_1)/log10(x) is what the record must show ≲ 1.
    if (which == "r8ops" || which == "r9ops" || which == "r10ops" || which == "r11ops" ||
        which == "r12ops" || which == "r13ops" || which == "r13bops") {
      import graft.ops.{ModelOps, SimilarityOps, TextOps, UrlOps}
      // Replicated inputs are materialized ONCE, OUTSIDE the timers:
      // blending the linear write+re-read generation I/O into t1/tx
      // biases every exponent toward 1 and can mask superlinear
      // operator behavior — the exact defect the ≤ 1 record exists
      // to catch.
      def embAt(mult: Int, path: String): DataFrame = {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        (0 until mult).map { i =>
          emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            transform(col("embedding"), e => e + lit(0.001f * i)).as("embedding"))
        }.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
      def docsAt(mult: Int, path: String): DataFrame = {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        (0 until mult).map { i =>
          docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            col("source"), col("text"), col("n_chars"))
        }.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
      val docs1 = docsAt(1, "/tmp/graft_stress_r8d1")
      val docsX = docsAt(x, "/tmp/graft_stress_r8dx")
      val emb1 = embAt(1, "/tmp/graft_stress_r8e1")
      val embX = embAt(x, "/tmp/graft_stress_r8ex")
      def bt(d: DataFrame): Long = {
        // the q242 comparison derivation (consecutive ids; replica
        // offsets of 1e7 keep copies from chaining into each other)
        val s = d.filter(col("n_chars").isNotNull)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val cmp = s.select(col("doc_id"), col("source").as("s1"), col("n_chars").as("l1"))
          .join(s.select((col("doc_id") - 1).as("doc_id"),
            col("source").as("s2"), col("n_chars").as("l2")), Seq("doc_id"))
          .filter(col("s1") =!= col("s2") && col("l1") =!= col("l2"))
          .select(when(col("l1") > col("l2"), col("s1")).otherwise(col("s2")).as("winner"),
            when(col("l1") > col("l2"), col("s2")).otherwise(col("s1")).as("loser"))
        ModelOps.bradleyTerry(cmp).count()
      }
      def conformal(d: DataFrame): Long =
        ModelOps.conformalThreshold(TextOps.qualityFrame(d)
          .select(col("quality_score"), (col("doc_id") % 5 === 0).as("__cal"))).count()
      def conformalGroup(d: DataFrame): Long =
        ModelOps.conformalThresholdByGroup(TextOps.qualityFrame(d, carryCols = Seq("source"))
          .select(col("source"), col("quality_score"),
            (expr("doc_id div 20") % 5 === 0).as("__cal"))).count()
      // r9ops: the round-9 additions — q252's scan is map-only, q253's
      // (doc, pos) self-join is the only corpus shuffle, q251/q254 are
      // trace/centroid passes. The drift arm splits each replica on the
      // within-corpus id so both snapshots grow with the corpus.
      def canary(d: DataFrame): Long =
        TextOps.canaryAudit(d.filter(col("text").isNotNull)
          .select(col("source"),
            when(col("doc_id") % 17 === 0,
              concat(col("text"), lit(" canary-"),
                substring(md5((col("doc_id") % 20).cast("string")), 1, 8)))
              .otherwise(col("text")).as("text")),
          OpsEntries.canaryRegistry).count()
      def drift(docs: DataFrame, emb: DataFrame): Long =
        SimilarityOps.snapshotCentroidDrift(
          docs.filter(col("doc_id") % 5 =!= 4),
          docs.filter(col("doc_id") % 7 =!= 6), emb).count()
      val ops: Seq[(String, DataFrame, DataFrame, DataFrame => Long)] =
        if (which == "r13bops") Seq(
          // the COMPLETE q286 build: the URL tier kills replica mass,
          // the domain tier then BOUNDS the extract-tier entrants
          // (blocklist + 25/domain cap), so everything downstream of
          // the caps sees constant-size survivors regardless of x —
          // the production behavior the cap exists to guarantee
          ("pipeline_complete", docs1, docsX, d => {
            val normed = UrlOps.urlNormalize(OpsEntries.urlFixture3(d),
              extraKill = OpsEntries.reviewedKill).localCheckpoint(true)
            val dedup = UrlOps.urlDedup(normed).localCheckpoint(true)
            val nuniq = normed.join(dedup.filter(col("keep")).select("doc_id"), Seq("doc_id"))
              .localCheckpoint(true)
            val bl = UrlOps.domainBlocklist(nuniq, OpsEntries.pipeBlockedDomains)
              .localCheckpoint(true)
            val nAfterBl = nuniq.join(bl.filter(!col("blocked")).select("doc_id"), Seq("doc_id"))
              .localCheckpoint(true)
            val capped = UrlOps.domainCaps(nAfterBl, cap = OpsEntries.pipeDomainCap)
              .localCheckpoint(true)
            val ext = TextOps.htmlExtract(OpsEntries.htmlFixture3(
              d.join(capped.select("doc_id"), Seq("doc_id"))))
              .select(col("doc_id"), col("text"))
            val rep = TextOps.encodingDamage(ext)
              .select(col("doc_id"), col("text_repaired").as("text"),
                coalesce(regexp_count(col("text_repaired"), lit(TextOps.mojibakeDetector)),
                  lit(0)).cast("long").as("resid")).localCheckpoint(true)
            val s1 = rep.filter(col("resid") === 0).select(col("doc_id"), col("text"))
            val blk = TextOps.wordBlocklistGate(s1, OpsEntries.blockedWords,
              maxRatio = OpsEntries.wordGateMaxRatio)
            val s2 = s1.join(blk.filter(col("keep")).select("doc_id"), Seq("doc_id"))
              .localCheckpoint(true)
            val cleaned = TextOps.removeLines(s2, TextOps.boilerplateLines(s2).select("line"))
              .select(col("doc_id"), col("clean_text").as("text")).localCheckpoint(true)
            val sd = TextOps.dedupSentencesAcrossDocs(cleaned.filter(col("text") =!= ""))
              .localCheckpoint(true)
            val cur = OpsEntries.curationFrame(sd.filter(col("clean_text") =!= "")
              .select(col("doc_id"), col("clean_text").as("text")).localCheckpoint(true))
            normed.filter(col("url_norm").isNull).select("doc_id")
              .unionByName(dedup.filter(!col("keep")).select("doc_id"))
              .unionByName(bl.filter(col("blocked")).select("doc_id"))
              .unionByName(cur.select("doc_id")).count()
          }),
          // href regex explode + the §5.2 resolution fold: map-only,
          // must scale like the scan (per-row work is anchor-count ×
          // segment-count, independent of corpus x)
          ("link_extract", docs1, docsX,
            d => UrlOps.extractLinks(OpsEntries.linkFixture(d), baseCol = "base").count()),
          // same rollup, the two-score HITS unroll on the domain graph
          ("link_graph_hits", docs1, docsX, d => {
            val lx = UrlOps.extractLinks(OpsEntries.linkFixture(d), baseCol = "base")
              .filter(col("is_web"))
            val ed = lx.select(
                UrlOps.registeredDomainFull(UrlOps.hostOf(col("base"))).as("src_dom"),
                UrlOps.registeredDomainFull(UrlOps.hostOf(col("link"))).as("dst_dom"))
              .groupBy("src_dom", "dst_dom").agg(count(lit(1)).as("n_links"))
              .localCheckpoint(true)
            val nodes = ed.select(col("src_dom").as("domain"))
              .unionByName(ed.select(col("dst_dom").as("domain"))).distinct()
            graft.ops.GraphOps.hits(ed, nodes, srcCol = "src_dom",
              dstCol = "dst_dom", weightCol = "n_links").count()
          }),
          // same rollup, directed unroll — the per-source out-weight
          // aggregate replaces the sym union
          ("link_graph_directed", docs1, docsX, d => {
            val lx = UrlOps.extractLinks(OpsEntries.linkFixture(d), baseCol = "base")
              .filter(col("is_web"))
            val ed = lx.select(
                UrlOps.registeredDomainFull(UrlOps.hostOf(col("base"))).as("src_dom"),
                UrlOps.registeredDomainFull(UrlOps.hostOf(col("link"))).as("dst_dom"))
              .groupBy("src_dom", "dst_dom").agg(count(lit(1)).as("n_links"))
              .localCheckpoint(true)
            val nodes = ed.select(col("src_dom").as("domain"))
              .unionByName(ed.select(col("dst_dom").as("domain"))).distinct()
            graft.ops.GraphOps.pageRankDirected(ed, nodes, srcCol = "src_dom",
              dstCol = "dst_dom", weightCol = "n_links").count()
          }),
          // corpus-scale work is the one (src,dst)-keyed edge rollup;
          // the PR iterations run on the domain-sized graph
          ("link_graph", docs1, docsX, d => {
            val lx = UrlOps.extractLinks(OpsEntries.linkFixture(d), baseCol = "base")
              .filter(col("is_web"))
            val ed = lx.select(
                UrlOps.registeredDomainFull(UrlOps.hostOf(col("base"))).as("src_dom"),
                UrlOps.registeredDomainFull(UrlOps.hostOf(col("link"))).as("dst_dom"))
              .groupBy("src_dom", "dst_dom").agg(count(lit(1)).as("n_links"))
              .localCheckpoint(true)
            val nodes = ed.select(col("src_dom").as("domain"))
              .unionByName(ed.select(col("dst_dom").as("domain"))).distinct()
            graft.ops.GraphOps.pageRank(ed, nodes, srcCol = "src_dom", dstCol = "dst_dom",
              weightCol = "n_links").count()
          }),
          // map-only domain/path derivation + ONE broadcast regex
          // join (robots-file-sized rule side) + one id-keyed max
          ("robots_verdict", docs1, docsX, d =>
            UrlOps.robotsVerdict(UrlOps.urlNormalize(OpsEntries.urlFixture3(d)),
              OpsEntries.pipeRobotsRules).count()),
          // the GOVERNED build: robots + blocklist + cap all bound the
          // extract-tier entrants, so downstream is constant-size
          ("pipeline_governed", docs1, docsX, d => {
            val normed = UrlOps.urlNormalize(OpsEntries.urlFixture3(d),
              extraKill = OpsEntries.reviewedKill).localCheckpoint(true)
            val dedup = UrlOps.urlDedup(normed).localCheckpoint(true)
            val nuniq = normed.join(dedup.filter(col("keep")).select("doc_id"), Seq("doc_id"))
              .localCheckpoint(true)
            val rv = UrlOps.robotsVerdict(nuniq, OpsEntries.pipeRobotsRules)
              .localCheckpoint(true)
            val nAfterRv = nuniq.join(rv.filter(col("allowed")).select("doc_id"), Seq("doc_id"))
            val bl = UrlOps.domainBlocklist(nAfterRv, OpsEntries.pipeBlockedDomains2)
              .localCheckpoint(true)
            val nAfterBl = nAfterRv.join(bl.filter(!col("blocked")).select("doc_id"), Seq("doc_id"))
            val capped = UrlOps.domainCaps(nAfterBl, cap = OpsEntries.pipeDomainCap)
              .localCheckpoint(true)
            val ext = TextOps.htmlExtract(OpsEntries.htmlFixture3(
              d.join(capped.select("doc_id"), Seq("doc_id"))))
              .select(col("doc_id"), col("text")).localCheckpoint(true)
            val cleaned = TextOps.removeLines(ext, TextOps.boilerplateLines(ext).select("line"))
              .select(col("doc_id"), col("clean_text").as("text")).localCheckpoint(true)
            val cur = OpsEntries.curationFrame(cleaned.filter(col("text") =!= ""))
            rv.filter(!col("allowed")).select("doc_id")
              .unionByName(bl.filter(col("blocked")).select("doc_id"))
              .unionByName(cur.select("doc_id")).count()
          }),
          // one crawl iteration: link explode + two normalize chains +
          // the url_norm-keyed anti-join + robots + domain rollup —
          // the anti-join is the only exchange whose BOTH sides grow
          ("frontier_discovery", docs1, docsX, d => {
            val lx = UrlOps.extractLinks(OpsEntries.linkFixture(d), baseCol = "base")
              .filter(col("is_web"))
            val cand = UrlOps.urlNormalize(lx.select(col("doc_id"), col("link").as("url")))
            val seen = UrlOps.urlNormalize(
                OpsEntries.linkFixture(d).select(col("doc_id"), col("base").as("url")))
              .select(col("url_norm")).distinct()
            val newu = cand.filter(col("url_norm").isNotNull)
              .select(col("url_norm"), col("host")).distinct()
              .join(seen, Seq("url_norm"), "left_anti")
              .withColumn("nid", md5(col("url_norm")))
            UrlOps.robotsVerdict(newu, OpsEntries.pipeRobotsRules, idCol = "nid")
              .groupBy("reg_domain")
              .agg(count(lit(1)).as("n_new"),
                sum(when(col("allowed"), 1L).otherwise(0L)).as("n_fetchable")).count()
          }),
          // anchor-pair explode + resolve + tokenize (all map-only),
          // ONE (dst_domain, term) partial-aggregable rollup
          ("anchor_index", docs1, docsX, d =>
            UrlOps.anchorTextIndex(OpsEntries.linkFixture(d), baseCol = "base").count()),
          // the capstone: discovery + directed authority + waterfill +
          // the per-domain rank window — the rank window keys on
          // reg_domain over the DISTINCT new-URL set (the anti-join
          // and the edge rollup are the only corpus-scale exchanges)
          ("fetch_plan", docs1, docsX, d => {
            val lx = UrlOps.extractLinks(OpsEntries.linkFixture(d), baseCol = "base")
              .filter(col("is_web")).localCheckpoint(true)
            val cand = UrlOps.urlNormalize(lx.select(col("doc_id"), col("link").as("url")))
            val seen = UrlOps.urlNormalize(
                OpsEntries.linkFixture(d).select(col("doc_id"), col("base").as("url")))
              .select(col("url_norm")).distinct()
            val newu = cand.filter(col("url_norm").isNotNull)
              .select(col("url_norm"), col("host")).distinct()
              .join(seen, Seq("url_norm"), "left_anti")
              .withColumn("nid", md5(col("url_norm")))
            val fetchable = UrlOps.robotsVerdict(newu, OpsEntries.pipeRobotsRules, idCol = "nid")
              .filter(col("allowed")).select(col("nid"), col("url_norm"), col("reg_domain"))
              .localCheckpoint(true)
            val ed = lx.select(
                UrlOps.registeredDomainFull(UrlOps.hostOf(col("base"))).as("src_dom"),
                UrlOps.registeredDomainFull(UrlOps.hostOf(col("link"))).as("dst_dom"))
              .groupBy("src_dom", "dst_dom").agg(count(lit(1)).as("n_links"))
              .localCheckpoint(true)
            val nodes = ed.select(col("src_dom").as("domain"))
              .unionByName(ed.select(col("dst_dom").as("domain"))).distinct()
            val pr = graft.ops.GraphOps.pageRankDirected(ed, nodes, srcCol = "src_dom",
              dstCol = "dst_dom", weightCol = "n_links")
            val dem = fetchable.groupBy("reg_domain").agg(count(lit(1)).as("n_fetchable"))
              .join(pr.select(col("domain").as("reg_domain"), col("pr")), Seq("reg_domain"), "left")
              .select(col("reg_domain").as("source"),
                col("n_fetchable").cast("long").as("capacity"),
                coalesce(col("pr"), lit(0.000001)).as("weight"))
              .localCheckpoint(true)
            val budget = math.floor(
              dem.agg(sum("capacity")).head().getLong(0).toDouble * 0.6).toLong
            val alloc = graft.ops.SampleOps.waterfillAllocation(dem, budget)
              .select(col("source").as("reg_domain"), col("alloc"))
            val w = org.apache.spark.sql.expressions.Window.partitionBy("reg_domain")
              .orderBy(col("nid"), col("url_norm"))
            fetchable.withColumn("rank", row_number().over(w).cast("long"))
              .join(alloc, Seq("reg_domain"), "left")
              .filter(col("rank") <= coalesce(col("alloc"), lit(0L))).count()
          }),
          // one frontier rollup (domain-keyed, partial-aggregable),
          // then the waterfill solve over the domain-sized frame
          ("crawl_budget", docs1, docsX, d => {
            val fr = UrlOps.frontierReport(UrlOps.urlNormalize(OpsEntries.urlFixture3(d),
                extraKill = OpsEntries.reviewedKill))
              .select(col("reg_domain").as("source"),
                ((col("n_unique") + col("n_urls"))
                  * (pmod(graft.ops.SampleOps.seededHash(col("reg_domain"), 7L), lit(3L)) + 1L))
                  .cast("long").as("capacity"),
                col("n_unique").cast("double").as("weight"))
              .localCheckpoint(true)
            val budget = math.floor(
              fr.agg(sum("capacity")).head().getLong(0).toDouble * 0.9).toLong
            graft.ops.SampleOps.waterfillAllocation(fr, budget).count()
          }))
        else if (which == "r13ops") Seq(
          // the full ~9.5k-rule table as a MAP-ONLY expression: must
          // scale like the scan (per-row work is ≤ label-count hash
          // probes against a per-JVM static, independent of corpus x)
          ("psl_expr", docs1, docsX, d =>
            OpsEntries.hostFixture2(d)
              .select(UrlOps.registeredDomainFull(col("host")).as("rd"))
              .filter(col("rd").isNotNull).count()),
          // the broadcast-join form re-priced at the FULL table: the
          // rule side grew 50 -> 9.5k rows but stays registry-sized;
          // the corpus side's explode is still ≤ label-count rows/host
          ("psl_domain_full", docs1, docsX,
            d => UrlOps.registeredDomainPsl(OpsEntries.hostFixture2(d)).count()),
          // the COMPLETE q284 pipeline: url tier (reviewed kill) kills
          // replica mass first, gates are map-only/broadcast, the
          // sentence tier's fingerprint window and the curation
          // shuffles only ever see survivors
          ("pipeline_sentences", docs1, docsX, d => {
            val normed = UrlOps.urlNormalize(OpsEntries.urlFixture2(d),
              extraKill = OpsEntries.reviewedKill).localCheckpoint(true)
            val dedup = UrlOps.urlDedup(normed).localCheckpoint(true)
            val kept = dedup.filter(col("keep")).select("doc_id")
            val ext = TextOps.htmlExtract(OpsEntries.htmlFixture3(d.join(kept, Seq("doc_id"))))
              .select(col("doc_id"), col("text"))
            val rep = TextOps.encodingDamage(ext)
              .select(col("doc_id"), col("text_repaired").as("text"),
                coalesce(regexp_count(col("text_repaired"), lit(TextOps.mojibakeDetector)),
                  lit(0)).cast("long").as("resid")).localCheckpoint(true)
            val s1 = rep.filter(col("resid") === 0).select(col("doc_id"), col("text"))
            val blk = TextOps.wordBlocklistGate(s1, OpsEntries.blockedWords,
              maxRatio = OpsEntries.wordGateMaxRatio)
            val s2 = s1.join(blk.filter(col("keep")).select("doc_id"), Seq("doc_id"))
              .localCheckpoint(true)
            val cleaned = TextOps.removeLines(s2, TextOps.boilerplateLines(s2).select("line"))
              .select(col("doc_id"), col("clean_text").as("text")).localCheckpoint(true)
            val sd = TextOps.dedupSentencesAcrossDocs(cleaned.filter(col("text") =!= ""))
              .localCheckpoint(true)
            val cur = OpsEntries.curationFrame(sd.filter(col("clean_text") =!= "")
              .select(col("doc_id"), col("clean_text").as("text")).localCheckpoint(true))
            normed.filter(col("url_norm").isNull).select("doc_id")
              .unionByName(dedup.filter(!col("keep")).select("doc_id"))
              .unionByName(cur.select("doc_id")).count()
          }),
          // paramReport with the cross-carrier merge probe: the new
          // semi-join keys on (domain, url) — both sides grow with x,
          // both high-cardinality
          ("param_report_v2", docs1, docsX,
            d => UrlOps.paramReport(UrlOps.urlNormalize(OpsEntries.paramFixture(d))).count()),
          // punycode fold + domain rollup: map-only fold, one distinct
          ("idn_fold", docs1, docsX,
            d => UrlOps.idnReportFolded(
              UrlOps.urlNormalize(OpsEntries.idnFixture(d))).count()))
        else if (which == "r12ops") Seq(
          // percent-canonicalizing normalize + ONE url_norm window:
          // still must scale like the scan (the pctCanon transform is
          // per-row over ≤ param-count list elements)
          ("url_pct_dedup", docs1, docsX,
            d => UrlOps.urlDedup(UrlOps.urlNormalize(OpsEntries.urlFixture(d))).count()),
          // sentence tier at the replication worst case: every replica
          // shares EVERY sentence with its source doc, so the
          // fingerprint window sees x-deep keys on all of them —
          // duplicate mass is exactly what the tier must absorb
          ("sentence_dedup", docs1, docsX, d =>
            TextOps.dedupSentencesAcrossDocs(
              d.filter(col("text").isNotNull).select(col("doc_id"),
                concat(col("text"), lit(OpsEntries.sentDedupSuffix)).as("text"))).count()),
          // the COMPLETE q278 first mile: url tier kills the replica
          // mass before extract/repair/gates/boiler/curate see it —
          // survivors stay ~group-count-sized regardless of x
          ("first_mile", docs1, docsX, d => {
            val dedup = UrlOps.urlDedup(UrlOps.urlNormalize(OpsEntries.urlFixture(d)))
              .localCheckpoint(true)
            val kept = dedup.filter(col("keep")).select("doc_id")
            val ext = TextOps.htmlExtract(OpsEntries.htmlFixture2(d.join(kept, Seq("doc_id"))))
              .select(col("doc_id"), col("text"))
            val rep = TextOps.encodingDamage(ext)
              .select(col("doc_id"), col("text_repaired").as("text"),
                coalesce(regexp_count(col("text_repaired"), lit(TextOps.mojibakeDetector)),
                  lit(0)).cast("long").as("resid")).localCheckpoint(true)
            val s1 = rep.filter(col("resid") === 0).select(col("doc_id"), col("text"))
            val blk = TextOps.wordBlocklistGate(s1, OpsEntries.blockedWords,
              maxRatio = OpsEntries.wordGateMaxRatio)
            val s2 = s1.join(blk.filter(col("keep")).select("doc_id"), Seq("doc_id"))
              .localCheckpoint(true)
            val cleaned = TextOps.removeLines(s2, TextOps.boilerplateLines(s2).select("line"))
              .select(col("doc_id"), col("clean_text").as("text")).localCheckpoint(true)
            val cur = OpsEntries.curationFrame(cleaned.filter(col("text") =!= ""))
            dedup.filter(!col("keep")).select("doc_id")
              .unionByName(cur.select("doc_id")).count()
          }),
          // broadcast rule-table join: label explode is ≤ 5 rows/host
          ("psl_domain", docs1, docsX,
            d => UrlOps.registeredDomainPsl(OpsEntries.hostFixture2(d)).count()),
          // param explode + one (domain, key) rollup; output stays
          // (domain × key)-sized while input grows x-fold
          ("param_report", docs1, docsX,
            d => UrlOps.paramReport(UrlOps.urlNormalize(OpsEntries.paramFixture(d))).count()))
        else if (which == "r11ops") Seq(
          // URL tier alone: map-only normalize + ONE url_norm-keyed
          // window. Replication multiplies every frontier group by x —
          // the crawl-duplication worst case the tier exists to kill.
          ("url_pipeline", docs1, docsX,
            d => UrlOps.urlDedup(UrlOps.urlNormalize(OpsEntries.urlFixture(d))).count()),
          // The composed first mile: the replicas SHARE normalized
          // URLs, so the dedup kills them BEFORE the extract/curate
          // tier — the survivors are ~group-count-sized regardless of
          // x. Contrast with r10ops extract_curate (0.65 at the same
          // replication): the measured case for killing duplicates at
          // the URL tier instead of the shingle tier.
          ("url_extract_curate", docs1, docsX, d => {
            val dedup = UrlOps.urlDedup(UrlOps.urlNormalize(OpsEntries.urlFixture(d)))
              .localCheckpoint(true)
            val kept = dedup.filter(col("keep")).select("doc_id")
            val cur = OpsEntries.curationFrame(TextOps.htmlExtract(
              OpsEntries.htmlFixture(d.join(kept, Seq("doc_id"))))
              .select(col("doc_id"), col("text")).localCheckpoint(true))
            dedup.filter(!col("keep")).select(col("doc_id"))
              .unionByName(cur.select(col("doc_id"))).count()
          }),
          // discover → broadcast-remove → curate. Verbatim replicas
          // push EVERY content line over the df≥2 bar (the planted
          // worst case: discovery bans everything), so the arm times
          // the explode + line-keyed aggregate + broadcast removal at
          // full volume with the curate tier degenerate behind it.
          ("boiler_removed_curate", docs1, docsX, d => {
            val ex = TextOps.htmlExtract(OpsEntries.htmlFixture(d))
              .select(col("doc_id"), col("text")).localCheckpoint(true)
            val hits = TextOps.boilerplateLines(ex).select("line")
            OpsEntries.curationFrame(TextOps.removeLines(ex, hits)
              .select(col("doc_id"), col("clean_text").as("text"))
              .localCheckpoint(true)).count()
          }),
          // map-only detector + repair chain: must scale like the scan
          ("encoding_damage", docs1, docsX,
            d => TextOps.encodingDamage(OpsEntries.mojiFixture(d)).count()),
          // both sides of the doc⋈embedding join grow together
          ("ivf_refresh_partial", docs1, docsX,
            d => SimilarityOps.ivfRefreshPartial(
              d.filter(col("doc_id") % 5 =!= 4), d.filter(col("doc_id") % 7 =!= 6),
              if (d eq docs1) emb1 else embX).count()))
        else if (which == "r10ops") Seq(
          // auto-k (the semDedupK policy): pinned k would grow the
          // dedup tier's within-cell pairs quadratically with the
          // corpus — the exact trap the exponent record exists to show
          ("cluster_served", emb1, embX,
            d => SimilarityOps.clusterServeReport(d, k = -1).count()),
          // both sides of the doc⋈embedding join grow together (the
          // r9 drift-arm lesson)
          ("ivf_refresh", docs1, docsX,
            d => SimilarityOps.ivfRefresh(
              d.filter(col("doc_id") % 5 =!= 4), d.filter(col("doc_id") % 7 =!= 6),
              if (d eq docs1) emb1 else embX).count()),
          ("html_extract", docs1, docsX,
            d => graft.ops.TextOps.htmlExtract(OpsEntries.htmlFixture(d)).count()),
          // NOTE the replication is the near-dup worst case: every doc
          // gains x-1 VERBATIM copies, so minhash candidate pairs grow
          // ~x² inside the copy cliques (real corpus growth adds new
          // content; zipftext measured the deliberate-clique tier) —
          // the extract stage itself is the map-only part under test
          ("extract_curate", docs1, docsX,
            d => OpsEntries.curationFrame(
              graft.ops.TextOps.htmlExtract(OpsEntries.htmlFixture(d))
                .select(col("doc_id"), col("text")).localCheckpoint(true)).count()))
        else if (which == "r9ops") Seq(
          ("canary_audit", docs1, docsX, canary),
          ("loop_detect", docs1, docsX, d => TextOps.periodicityReport(d).count()),
          ("abtt_gated", emb1, embX, d => SimilarityOps.abttGated(d).count()),
          // both sides of the doc⋈embedding join must grow together
          // (replica id offsets match), or the join silently pins the
          // op at base size and fakes a flat exponent
          ("centroid_drift", docs1, docsX,
            d => drift(d, if (d eq docs1) emb1 else embX)))
        else Seq(
          ("bradley_terry", docs1, docsX, bt),
          ("conformal", docs1, docsX, conformal),
          ("conformal_group", docs1, docsX, conformalGroup),
          ("silhouette", emb1, embX, d => SimilarityOps.silhouetteReport(d).count()),
          ("remove_top", emb1, embX, d => SimilarityOps.removeTopComponent(d).count()),
          ("isotropy", emb1, embX, d => SimilarityOps.isotropyReport(d).count()),
          ("kcenter", emb1, embX, d => SimilarityOps.kCenterGreedy(d).count()))
      for ((name, d1, dx, run) <- ops) {
        run(d1) // warm-up: JIT + codegen cache, untimed
        val (r1, t1) = time(run(d1))
        val (rx, tx) = time(run(dx))
        val expo = math.log10(tx / t1) / math.log10(x.toDouble)
        val opsLabel =
          if (which == "r13bops") "STRESS_R13BOPS"
          else if (which == "r13ops") "STRESS_R13OPS"
          else if (which == "r12ops") "STRESS_R12OPS"
          else if (which == "r11ops") "STRESS_R11OPS"
          else if (which == "r10ops") "STRESS_R10OPS"
          else if (which == "r9ops") "STRESS_R9OPS" else "STRESS_R8OPS"
        println(f"$opsLabel op=$name rows_1=$r1 rows_$x=$rx " +
          f"t1=$t1%.2fs t$x=$tx%.2fs exponent=$expo%.2f")
      }
    }

    // q95: the single-fat-source worst case — every doc in ONE group, so
    // the running-sum window sorts the whole corpus on one task (the
    // same concentration tokenBudgetPack's pre-filter bounds; sequence
    // packing has no cut because every row is admitted by definition).
    if (which == "seqpack" || which == "all") {
      import graft.ops.{SampleOps, TextOps}
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until x).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet("/tmp/graft_stress_seq")
      val base = spark.read.parquet("/tmp/graft_stress_seq")
        .where(col("text").isNotNull)
        .select(lit("fat").as("source"), col("doc_id"),
          size(graft.ops.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      val (n, t) = time(SampleOps.sequencePack(base, "source", "doc_id", "n_tokens", 2048L)
        .queryExecution.toRdd.count())
      println(f"STRESS_SEQPACK rows=$n single_source_time=$t%.2fs")
    }
    spark.stop()
  }
}
