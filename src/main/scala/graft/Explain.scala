package graft
import org.apache.spark.sql.SparkSession

/** Dev aid: print the formatted physical plan (and row count) of one or
  * more `SparkEntry.queries` entries. `runMain graft.Explain q19_pagination
  * [q20_exact_dedup ...]` — plan-review loop per the scale checklist in
  * SCALE.md.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      println("ROWS=" + df.count() + " in " + (System.nanoTime() - t0) / 1e9 + "s")
    }
    spark.stop()
  }
}
