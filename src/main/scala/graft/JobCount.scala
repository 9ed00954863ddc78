package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev aid for the optimization rounds (PlanDump's sibling): run named
  * `SparkEntry.queries` entries once and report how many Spark JOBS and
  * STAGES each fires — the metric the driver-overhead-bound queries
  * (scaling ratio ≈ 1 at 8 vs 32 cores) are actually paying.
  * `runMain graft.JobCount q106_image_hash_dedup [...]`. Session config
  * mirrors Bench. Counts include jobs fired during query CONSTRUCTION
  * (collect-gates, localCheckpoints, training loops) — exactly the ones
  * to collapse.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
    })
    val all = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    args.foreach { name =>
      val fn = all(name)
      fn(spark, sfDir).queryExecution.toRdd.count() // warm (codegen, IO cache)
      Thread.sleep(200)
      jobs = 0; stages = 0
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"$name: $jobs jobs, $stages stages, $dt%.2f s")
    }
    spark.stop()
  }
}
