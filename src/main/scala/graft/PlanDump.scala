package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev aid for the optimization rounds: write `.explain("formatted")`
  * of named `SparkEntry.queries` entries to files —
  * `runMain graft.PlanDump <outDir> <suffix> q246_isotropy [...]`
  * produces `<outDir>/<name>_<suffix>.txt` per query, the judge-facing
  * plan artifacts (plans/r14/<query>_before.txt / _after.txt).
  * Session config mirrors Bench (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus) so the dumped plan is the one the bench runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val all = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    names.foreach { name =>
      val df = all(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      val nEx = "(?m)^\\s*[+:]?[- ]*Exchange".r.findAllIn(plan).size
      println(s"$name: ${plan.linesIterator.size} plan lines, ~$nEx Exchange")
    }
    spark.stop()
  }
}
