package graft

import graft.names.{Glob, MetricNames, MetricValidator}
import org.scalatest.funsuite.AnyFunSuite

/** Golden semantics from reference MetricUtilTest / MetricValidatorTest /
  * MetricTreeTest glob tables (FIXTURES.md §3/§5).
  */
class NamesSpec extends AnyFunSuite {

  test("level / parent / lastLevel / isDir") {
    assert(MetricNames.level("a.b.c") == 3)
    assert(MetricNames.level("a.b.") == 2)
    assert(MetricNames.level("a") == 1)
    assert(MetricNames.isDir("a.b."))
    assert(!MetricNames.isDir("a.b.c"))
    assert(MetricNames.parent("a.b.c") == "a.b.")
    assert(MetricNames.parent("a.b.") == "a.")
    assert(MetricNames.parent("a.") == "")
    assert(MetricNames.parent("a") == "")
    assert(MetricNames.lastLevel("a.b.c") == "c")
    assert(MetricNames.lastLevel("a.b.") == "b")
    assert(MetricNames.splitToLevels("a.b.c").toSeq == Seq("a", "b", "c"))
  }

  private val v = MetricValidator()

  test("validator accepts well-formed names") {
    assert(v.validate("one_min.app.host1.requests"))
    assert(v.validate("five_sec.int_8742.x1"))
    assert(v.validate("a.bcd"))   // 5 chars, 2 levels
  }

  test("validator rejects the invalid corpus") {
    assert(!v.validate("one_min.app..requests"), "double dot")
    assert(!v.validate(".one_min.a"), "leading dot")
    assert(!v.validate("a.b"), "too short")
    assert(!v.validate("nodots"), "one level only")
    assert(!v.validate("a.b.c." ), "dir not allowed at ingest")
    assert(v.validate("a.b.c.", allowDirs = true))
    assert(!v.validate("bad.name!x"), "char outside whitelist")
    assert(!v.validate("x" * 501 + ".y"), "too long")
    assert(!v.validate(("a." * 20) + "b"), "too many levels")
  }

  private def matches(glob: String, name: String): Boolean =
    Glob.levelToRegex(glob).exists(re => name.matches(re))

  test("glob level semantics (reference MetricTreeTest goldens)") {
    assert(matches("int_874?", "int_8742"))
    assert(matches("int_874?", "int_8743"))
    assert(!matches("int_874?", "int_87421"))
    assert(matches("x*", "x1"))
    assert(matches("x*", "x"))
    assert(matches("msh0[1-6]d_market_yandex_net", "msh01d_market_yandex_net"))
    assert(matches("msh0[1-6]d_market_yandex_net", "msh03d_market_yandex_net"))
    assert(!matches("msh0[1-6]d_market_yandex_net", "msh07d_market_yandex_net"))
    assert(matches("market-front{,-ugr,-fol}", "market-front"))
    assert(matches("market-front{,-ugr,-fol}", "market-front-ugr"))
    assert(!matches("market-front{,-ugr,-fol}", "market-front-x"))
    assert(matches("[!a-c]x", "dx"))
    assert(!matches("[!a-c]x", "ax"))
  }

  test("invalid glob yields None (empty result, not an error)") {
    assert(Glob.levelToRegex("asdf[").isEmpty)
    assert(Glob.levelToRegex("a}b").isEmpty)
    assert(Glob.levelToRegex("a{b{c}}").isEmpty)
    assert(Glob.queryToRegex("a.asdf[.c").isEmpty)
  }

  test("query regex joins levels and tolerates trailing dir dot") {
    val re = Glob.queryToRegex("five_sec.int_874?.x1").get
    assert("five_sec.int_8742.x1".matches(re))
    assert(!"five_sec.int_8742.x12".matches(re))
    assert(!"five_sec.int_8742.y1".matches(re))
    val dirRe = Glob.queryToRegex("five_sec.*").get
    assert("five_sec.int_8742.".matches(dirRe))
    assert(!"five_sec.int_8742.x1".matches(dirRe))
    // '*' must not cross level boundaries
    assert(!"a.bc.d".matches(Glob.queryToRegex("a.b*").get))
  }
}
