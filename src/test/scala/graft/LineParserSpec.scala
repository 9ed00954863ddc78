package graft

import graft.ingest.LineParser
import org.scalatest.funsuite.AnyFunSuite

/** Ingest corpus goldens (FIXTURES.md §3, reference BaseMetricFactory). */
class LineParserSpec extends AnyFunSuite {
  private val p = new LineParser()

  test("valid line parses with enrichment") {
    val m = p.parse("one_min.app.host1.requests 12.0 1542199560", 1542199561).get
    assert(m.metric == "one_min.app.host1.requests")
    assert(m.value == 12.0)
    assert(m.timestamp == 1542199560)
    assert(m.updated == 1542199561)
    assert(m.date.toString == "2018-11-14")
  }

  test("float timestamp rounds") {
    assert(p.parse("one_min.app.req 1 1542199560.7", 0).get.timestamp == 1542199561)
    assert(p.parse("one_min.app.req 1 1542199560.2", 0).get.timestamp == 1542199560)
  }

  test("invalid corpus rejected") {
    assert(p.parse("one_min.app..requests 1 1542199560", 0).isEmpty, "double dot")
    assert(p.parse(".one_min.a 1 1542199560", 0).isEmpty, "leading dot")
    assert(p.parse("one_min.app.req NaN 1542199560", 0).isEmpty, "NaN")
    assert(p.parse("one_min.app.req Infinity 1542199560", 0).isEmpty, "Inf")
    assert(p.parse("one_min.app.req 1 0", 0).isEmpty, "ts <= 0")
    assert(p.parse("one_min.app.req 1 -5", 0).isEmpty, "negative ts")
    assert(p.parse("a.b 1 1542199560", 0).isEmpty, "too short")
    assert(p.parse("one_min.app.req 1", 0).isEmpty, "2 fields")
    assert(p.parse("one_min.app.req 1 2 3", 0).isEmpty, "4 fields")
    assert(p.parse("one_min.app.req x 1542199560", 0).isEmpty, "non-numeric value")
    assert(p.parse("one_min.app.req 1 x", 0).isEmpty, "non-numeric ts")
  }

  test("validColumn row-parity with the Scala validate, both allowDirs modes") {
    import graft.names.MetricValidator
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val v = MetricValidator()
    val corpus = Seq(
      "one_min.app.host1.requests",      // plainly valid
      "a.b.c",                            // 5 chars exactly (min length)
      "a.b",                              // too short
      "abcdef",                           // one level only
      ".a.b.c",                           // leading dot
      "a.b.c.",                           // dir: invalid unless allowDirs
      "ab.c.",                            // dir exactly at min-1 chars (dirs skip min length)
      "a..b.c",                           // empty level
      "a.b.c d",                          // whitespace → whitelist regex
      "a.b.cé",                           // non-ascii → whitelist regex
      "a.b.c-d_e.f9",                     // whitelist punctuation
      ("x." * 20) + "y",                  // 21 levels (> maxLevels)
      ("x." * 19) + "y",                  // 20 levels (at maxLevels)
      "x" * 501,                          // too long
      "ab." * 166 + "xy",                 // 500 chars exactly
      "one_min.a.b\n",                    // trailing LF: $ would pass, \z must not
      "one_min.a.b\r",                    // trailing CR
      "one_min.a.b\r\n"                   // CRLF tail from an unsplit line
    )
    for (allowDirs <- Seq(false, true)) {
      val got = corpus.toDF("name")
        .select(col("name"), v.validColumn(col("name"), allowDirs).as("valid"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      corpus.foreach { n =>
        assert(got(n) === v.validate(n, allowDirs),
          s"column/Scala disagreement on '$n' (allowDirs=$allowDirs)")
      }
    }
    // null name: the Scala form can't see one; the column form defines it invalid
    val nullRow = Seq[Option[String]](None).toDF("name")
      .select(v.validColumn(col("name")).as("valid")).head()
    assert(nullRow.getBoolean(0) === false)
  }

  test("host redirect rewrite (S3)") {
    val ph = new LineParser(hostPostfixes = Seq("_sas", "_vla"), hostDirName = "HOST")
    assert(ph.processName("one_min.web01_sas.cpu") == "one_min.HOST.web01_sas.cpu")
    assert(ph.processName("one_min.web01.cpu") == "one_min.web01.cpu")
    assert(ph.processName("one_min.web01_sas") == "one_min.web01_sas")
    assert(p.processName("one_min.web01_sas.cpu") == "one_min.web01_sas.cpu")
  }
}
