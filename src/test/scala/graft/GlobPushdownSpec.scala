package graft

import graft.functions.functions.glob_match
import graft.plans.{GlobRangePushdown, GraftExtensions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The glob range-pushdown rule: derived prefix predicate reaches the
  * parquet scan as StringStartsWith, results stay identical, and the
  * rewrite is idempotent.
  */
class GlobPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_globpd").toString
    (0 until 2000).map { i =>
      val prefix = if (i % 3 == 0) "one_min" else if (i % 3 == 1) "five_min" else "one_hour"
      (s"$prefix.app.host${i % 40}.m$i", i.toDouble)
    }.toDF("name", "value")
      .sortWithinPartitions("name")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("prefix predicate is derived and pushed to the parquet scan") {
    GraftExtensions.enable(spark)
    try {
      val q = spark.read.parquet(dir).filter(glob_match(col("name"), "one_min.app.host1?.m*"))
      val physical = q.queryExecution.executedPlan.toString
      assert(physical.contains("StringStartsWith(name,one_min.app.host1"),
        s"expected pushed prefix filter in:\n$physical")
      // results identical to the un-optimized evaluation
      val plain = spark.read.parquet(dir)
        .filter(col("name").rlike(graft.names.Glob.queryToRegex("one_min.app.host1?.m*").get))
      assert(q.select("name").as[String].collect().sorted.toSeq ==
        plain.select("name").as[String].collect().sorted.toSeq)
      assert(q.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[GlobRangePushdown])
    }
  }

  test("rule is idempotent and skips wildcard-leading patterns") {
    val rule = new GlobRangePushdown
    val base = spark.read.parquet(dir).filter(glob_match(col("name"), "one_min.*"))
      .queryExecution.optimizedPlan
    val once = rule(base)
    val twice = rule(once)
    assert(once == twice, "second application must be a no-op")
    assert(once.toString.contains("StartsWith"))
    // leading wildcard → no usable prefix, no StartsWith derived
    val noPrefix = rule(spark.read.parquet(dir).filter(glob_match(col("name"), "*.app.m1"))
      .queryExecution.optimizedPlan)
    assert(!noPrefix.toString.contains("StartsWith"))
  }

  test("literal prefix stops at escapes so escaped wildcards keep matching") {
    import graft.names.Glob
    // '\*' matches a literal '*': the derived prefix must not include
    // the backslash (no real name starts with one)
    assert(Glob.literalPrefix("m\\*x") == "m")
    assert(Glob.literalPrefix("one_min.app.host*") == "one_min.app.host")
    assert(Glob.literalPrefix("*.x") == "")
  }

  test("spark.sql.extensions injection registers glob_match for SQL too") {
    // simulate the extensions path on a builder-less session: apply the
    // injected function through the same builder the extension registers
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    // the rule and the function were both injected (no public getters:
    // verify via a real session using enable(), which shares the builder)
    graft.plans.GraftExtensions.enable(spark)
    val n = spark.sql(
      s"SELECT count(*) AS n FROM parquet.`$dir` WHERE glob_match(name, 'one_min.app.host1?.m*')")
      .collect()(0).getLong(0)
    assert(n > 0)
  }
}
