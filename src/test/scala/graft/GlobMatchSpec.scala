package graft

import graft.functions.functions.{glob_match, registerAll}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native glob predicate: eval + codegen parity, SQL registration,
  * invalid-glob fold.
  */
class GlobMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def names = Seq(
    "five_sec.int_8742.x1", "five_sec.int_8743.x1", "five_sec.int_87421.x1",
    "one_min.app.requests", "five_sec.int_8742."
  ).toDF("name")

  test("matches glob semantics through the Column API") {
    val got = names.filter(glob_match($"name", "five_sec.int_874?.x1"))
      .as[String].collect().toSet
    assert(got == Set("five_sec.int_8742.x1", "five_sec.int_8743.x1"))
  }

  test("trailing-dir dot tolerated, level boundaries respected") {
    val got = names.filter(glob_match($"name", "five_sec.*")).as[String].collect().toSet
    assert(got == Set("five_sec.int_8742."))
  }

  test("invalid glob matches nothing (no error)") {
    assert(names.filter(glob_match($"name", "asdf[")).count() == 0)
  }

  test("null input yields null, filtered out") {
    val withNull = Seq(Some("a.b"), None).toDF("name")
    assert(withNull.filter(glob_match($"name", "a.*")).count() == 1)
  }

  test("SQL registration") {
    registerAll(spark)
    names.createOrReplaceTempView("glob_names")
    val got = spark.sql(
      "SELECT name FROM glob_names WHERE glob_match(name, '{five_sec,one_min}.*.x1')"
    ).as[String].collect().toSet
    assert(got == Set("five_sec.int_8742.x1", "five_sec.int_8743.x1", "five_sec.int_87421.x1"))
  }

  test("codegen path active (no fallback exception, plan filters inline)") {
    // force both interpreted and codegen evaluation to agree
    val df = names.filter(glob_match($"name", "five_sec.int_8742.x?"))
    val plan = df.queryExecution.analyzed.toString.toLowerCase
    assert(df.count() == 1)
    assert(plan.contains("glob"), s"plan was: $plan")
  }
}
