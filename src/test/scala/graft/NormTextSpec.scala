package graft

import graft.functions.NormText
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The byte-walk normalizer/tokenizer vs the regex chains they replace
  * (`TextOps.normalized` / `TextOps.tokens`), over the full random
  * input space including multi-byte UTF-8, mojibake sequences, exotic
  * whitespace, and case-folding edge points (Kelvin sign, İ) — the
  * walks run on ALREADY-LOWERCASED input, exactly how the plan
  * composes them after `lower()`.
  */
class NormTextSpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name: $res")
  }

  /** Reference: the exact regex chain of TextOps.normalized, minus the
    * lower() the expression composes outside the walk.
    */
  private def refNormalize(lowered: String): String =
    lowered.replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ")
      .replaceAll("^ +| +$", "") // functions.trim strips spaces only

  /** Reference: split(lowered, "[^a-z0-9_']+") with empties filtered. */
  private def refTokens(lowered: String): Seq[String] =
    lowered.split("[^a-z0-9_']+", -1).toSeq.filter(_.nonEmpty)

  private val charGen: Gen[Char] = Gen.frequency(
    20 -> Gen.alphaLowerChar,
    6 -> Gen.alphaUpperChar,
    6 -> Gen.numChar,
    8 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000b'),
    6 -> Gen.oneOf('.', ',', '!', '_', '\'', '-', '/', '<', '>', '&'),
    3 -> Gen.oneOf('é', 'Ü', 'ß', '中', '文', 'Ã', '©', 'K', 'İ', ' '),
    1 -> Gen.oneOf('\u0000', '\u001f', '\u2028', '\uD83D')) // NUL, unit-sep, line-sep; surrogate guarded below
  private val textGen: Gen[String] = for {
    n <- Gen.frequency(2 -> Gen.choose(0, 4), 8 -> Gen.choose(5, 400))
    cs <- Gen.listOfN(n, charGen)
  } yield cs.mkString.replace('\uD83D', '❤') // no lone surrogates in valid UTF-8

  test("normalize equals the regex chain on lowered random text") {
    check(Prop.forAll(textGen) { s =>
      val lowered = UTF8String.fromString(s).toLowerCase
      NormText.normalize(lowered).toString == refNormalize(lowered.toString)
    }, "normalize parity")
  }

  test("tokenize equals split+filter on lowered random text") {
    check(Prop.forAll(textGen) { s =>
      val lowered = UTF8String.fromString(s).toLowerCase
      val got = NormText.tokenize(lowered)
      (0 until got.numElements()).map(i => got.getUTF8String(i).toString) ==
        refTokens(lowered.toString)
    }, "tokenize parity")
  }

  test("golden edges: empty, all-delims, mojibake, tabs, padding") {
    val cases = Seq(
      "", "   ", "\t\n\r", "...!!!", "a", " a ", "a  b", "a\tb\nc",
      "Hello, World!", "don't_stop", "x'y_z", "café Ã© naïve",
      "中文 mixed ascii", "A-B-C", "..a..b..", "0 1 22  333")
    cases.foreach { s =>
      val lowered = UTF8String.fromString(s).toLowerCase
      assert(NormText.normalize(lowered).toString == refNormalize(lowered.toString), s"norm: $s")
      val got = NormText.tokenize(lowered)
      assert((0 until got.numElements()).map(i => got.getUTF8String(i).toString) ==
        refTokens(lowered.toString), s"tok: $s")
    }
  }
}
