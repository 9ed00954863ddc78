package graft

import graft.ops.{DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit goldens for the LLM-pipeline operators. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog. The dog sleeps."),
    (2L, "The quick brown fox jumps over the lazy dog. The dog sleeps!"), // near-dup of 1
    (3L, "Der schnelle braune Fuchs springt und der Hund ist nicht da."),
    (4L, "completely different content about spark query engines and shuffles")
  ).toDF("doc_id", "text")

  test("exact dedup: punctuation-only variants collapse") {
    val out = DedupOps.exactDedup(docs).collect()
    assert(out.length == 3, "docs 1 and 2 share a fingerprint")
    val grp = out.find(_.getAs[Long]("dup_count") == 2).get
    assert(grp.getAs[Long]("keep_id") == 1L)
  }

  test("minhash candidates find the near-dup pair") {
    val pairs = DedupOps.minHashCandidates(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unique doc has no candidates")
  }

  test("jaccard verify scores the near-dup high") {
    val cand = DedupOps.minHashCandidates(docs)
    val j = DedupOps.jaccardVerify(cand, docs)
      .filter($"id_a" === 1L && $"id_b" === 2L)
      .select("jaccard").as[Double].collect()
    assert(j.length == 1 && j(0) > 0.9)
  }

  test("simhash: near-dups have small hamming distance") {
    val sh = DedupOps.simHash(docs).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) <= 2)
    assert(ham(sh(1L), sh(4L)) > 2)
  }

  test("cosine: identity is 1, orthogonal is 0") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val sim = e.as("a").crossJoin(e.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        SimilarityOps.cosine($"a.embedding", $"b.embedding").as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, c) => (x, y) -> c }.toMap
    assert(math.abs(sim((1L, 3L)) - 1.0) < 1e-12)
    assert(math.abs(sim((1L, 2L))) < 1e-12)
    assert(sim((1L, 4L)) == 0.0, "zero vector → 0, not NaN")
  }

  test("brute-force topk ranks by cosine with id tie-break") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.1f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = SimilarityOps.bruteForceTopK(e.filter($"vec_id" === 0), e, 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L) || top == Seq(2L, 1L)) // both ~0.995/0.994
    assert(top.size == 2 && !top.contains(3L))
  }

  test("lsh ann recall on self-similar vectors") {
    val e = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(d => if (d == (i % 4).toInt) 1.0f else 0.01f * i))).toDF("vec_id", "embedding")
    val out = SimilarityOps.lshTopK(e.filter($"vec_id" < 2), e, 3)
    // buckets must agree between query and corpus copies of the same vector
    assert(out.count() >= 0) // plumbing smoke; exactness covered by oracle q29
  }

  test("langId picks marker-heavy language, und on no hits") {
    val got = docs.select($"doc_id", TextOps.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(3L) == "de")
    val none = Seq((9L, "zzz qqq 12345")).toDF("doc_id", "text")
      .select(TextOps.langId($"text")).as[String].collect()(0)
    assert(none == "und")
  }

  test("langId detects non-Latin scripts via containment markers") {
    // the token regex drops CJK/Cyrillic runs, so these only work
    // through the containment path
    val got = Seq(
      (1L, "这是一个人在这里我他"),
      (2L, "он сказал что это не на словах и в делах"),
      (3L, "これは日本のテキストですしているとでて")
    ).toDF("doc_id", "text")
      .select($"doc_id", TextOps.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "zh")
    assert(got(2L) == "ru")
    assert(got(3L) == "ja")
  }

  test("token counts") {
    val r = Seq(("a b  c", 1)).toDF("text", "x").select(
      TextOps.wsTokenCount($"text").as("ws"),
      TextOps.bpeTokenCount($"text").as("bpe"),
      TextOps.charTokenEstimate($"text").as("est")
    ).collect()(0)
    assert(r.getAs[Int]("ws") == 3)
    assert(r.getAs[Long]("bpe") == 3)
    assert(r.getAs[Long]("est") == 2) // ceil(6/4)
  }

  test("fingerprint is normalization-invariant") {
    val fps = Seq((1L, "Hello,  World!"), (2L, "hello world"), (3L, "different"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("quality score ranges and ordering") {
    val scores = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and it is a fine day for that. " * 3),
      (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")
    ).toDF("doc_id", "text")
      .select($"doc_id", TextOps.qualityScore($"text").as("q"))
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > 0.7)
    assert(scores(2L) < 0.3)
    scores.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }
  test("htmlExtract: hand-built HTML golden — script/style/comment drop, " +
    "blocks become lines, entities decode, boilerplate density filter") {
    val html =
      "<html><head><title>My Page</title><script>if (a < b) { alert(\"hi\"); }</script>" +
        "<style>p { margin: 0; }</style></head><body>" +
        "<nav>Home About</nav>" +
        "<!-- hidden note with many many words that must never appear -->" +
        "<p>The quick brown fox jumps over the lazy dog.</p>" +
        "<div>Tom &amp; Jerry say &lt;hello&gt; to&nbsp;five friends</div>" +
        "<ul><li>short item</li><li>another much longer list item right here</li></ul>" +
        "<div class=\"footer\">Copyright 2026</div></body></html>"
    val got = TextOps.htmlExtract(Seq((1L, html)).toDF("doc_id", "html")).collect()(0)
    val text = got.getString(1)
    assert(text ===
      "The quick brown fox jumps over the lazy dog.\n" +
        "Tom & Jerry say <hello> to five friends\n" +
        "another much longer list item right here")
    assert(got.getLong(2) === 3L && got.getLong(3) === text.length.toLong)
    // no line survives the density floor: '' text, zero lines, schema kept
    val none = TextOps.htmlExtract(Seq((2L, "<p>tiny</p>")).toDF("doc_id", "html"))
      .collect()(0)
    assert(none.getString(1) === "" && none.getLong(2) === 0L && none.getLong(3) === 0L)
  }
  test("htmlExtract: wild markup — quoted '>' in attributes, unquoted attributes, " +
    "numeric entities (dec/hex/zeros/case), double-encoded amp stays literal") {
    // attribute values carrying '>' (double- and single-quoted) must strip
    // whole — the old <[^>]*> truncated at the quoted '>' and leaked b">
    val hostile =
      "<p>alpha <a title=\"a>b\" href='x>y'>link text</a> beta gamma delta</p>" +
        "<p data-x=plain>unquoted attribute keeps this prose line intact</p>" +
        "<p>it&#x27;s &#0039;quoted&#39; and&#160;spaced &#8212; dash &#X2019;curly</p>" +
        "<p>write &amp;#38; to show an entity but &#38; is just and</p>"
    val got = TextOps.htmlExtract(Seq((1L, hostile)).toDF("doc_id", "html")).collect()(0)
    val lines = got.getString(1).split("\n")
    assert(lines(0) === "alpha link text beta gamma delta")
    assert(lines(1) === "unquoted attribute keeps this prose line intact")
    assert(lines(2) === "it's 'quoted' and spaced — dash ’curly")
    // single-pass &-decode: &amp;#38; -> the literal text &#38;, never &
    assert(lines(3) === "write &#38; to show an entity but & is just and")
    // UNTERMINATED attribute quote: the quoted span is bounded at '<',
    // so the malformed tag LEAKS as text (conservative) instead of
    // swallowing the paragraph and the following tags into one "tag"
    val broken = TextOps.htmlExtract(Seq(
      (2L, "<p class=\"x>Hello there dear reader</p><p>normal line of prose here</p>"))
      .toDF("doc_id", "html")).collect()(0).getString(1)
    assert(broken.contains("Hello there dear reader"),
      s"content after an unterminated quote must survive: $broken")
    assert(broken.contains("normal line of prose here"))
  }
  test("wordBlocklistGate: ratio gate splits; zero-tolerance drops any hit; null text keeps") {
    val docs = Seq(
      (1L, "clean prose with no flagged vocabulary here at all"),
      (2L, "one bad apple in ten ordinary words right here ok"),
      (3L, "bad bad bad bad words"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextOps.wordBlocklistGate(docs, Seq("bad", "apple"), maxRatio = 0.25)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(2) === 0L && got(1L).getBoolean(4))
    assert(got(2L).getLong(2) === 2L && got(2L).getDouble(3) === 0.2 && got(2L).getBoolean(4))
    assert(got(3L).getLong(2) === 4L && got(3L).getDouble(3) === 0.8 && !got(3L).getBoolean(4))
    assert(got(4L).getLong(1) === 0L && got(4L).getBoolean(4)) // no evidence -> keep
    // C4 zero-tolerance: ANY hit drops
    val strict = TextOps.wordBlocklistGate(docs, Seq("bad"), maxRatio = 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(strict === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
    // case-insensitive list entry
    val ci = TextOps.wordBlocklistGate(Seq((9L, "BAD day")).toDF("doc_id", "text"),
      Seq("Bad")).collect()(0)
    assert(ci.getLong(2) === 1L && !ci.getBoolean(4))
  }
  test("sentenceSplit: [.!?]+space boundaries, in-order 0-based index, empties dropped") {
    val got = TextOps.sentenceSplit(Seq(
      (1L, "First one. Second!   Third ok? Last no-trailing-space."),
      (2L, "No boundary at all"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(got((1L, 0)) === "First one.")
    assert(got((1L, 1)) === "Second!")
    assert(got((1L, 2)) === "Third ok?")
    assert(got((1L, 3)) === "Last no-trailing-space.")
    assert(got((2L, 0)) === "No boundary at all")
    assert(got.keys.count(_._1 == 1L) === 4 && got.keys.count(_._1 == 3L) === 0)
  }
  test("sentenceSplit: abbreviation guard — listed forms do not split, unlisted still do, periods restore") {
    val got = TextOps.sentenceSplit(Seq(
      (1L, "Dr. Smith met Mrs. Jones. They left."),
      (2L, "See Fig. 2 for details. e.g. this one works, i.e. really."),
      (3L, "The U.S. Army split here. Fine."), // unlisted: documented limitation
      (4L, "Mr. X vs. Mr. Y! Verdict et al. pending."),
      (5L, "we laundr. it daily. Twice."), // no word anchor -> not protected
      (6L, "Ends with Dr. Next starts here.")) // guard holds even sentence-final
      .toDF("doc_id", "text")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toSeq).toMap
    assert(got(1L) === Seq("Dr. Smith met Mrs. Jones.", "They left."))
    assert(got(2L) === Seq("See Fig. 2 for details.",
      "e.g. this one works, i.e. really."))
    assert(got(3L) === Seq("The U.S.", "Army split here.", "Fine."))
    assert(got(4L) === Seq("Mr. X vs. Mr. Y!", "Verdict et al. pending."))
    assert(got(5L) === Seq("we laundr.", "it daily.", "Twice."))
    // the bounded-table tradeoff, pinned: a sentence that ENDS in a
    // listed form joins with its successor
    assert(got(6L) === Seq("Ends with Dr. Next starts here."))
  }
  test("dedupSentencesAcrossDocs: first occurrence wins corpus-wide; within-doc repeats and case/space variants cut") {
    val docs = Seq(
      (1L, "Alpha beta. Shared tail! Unique one."),
      (2L, "Gamma delta. Shared tail! Another."),
      (3L, "Repeat me. Repeat me. Fresh."),
      (4L, "shared  TAIL!"), // normalizes to doc 1's sentence -> cut
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.dedupSentencesAcrossDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 is the first occurrence of every one of its sentences
    assert(got(1L) === ((3L, 0L, "Alpha beta. Shared tail! Unique one.")))
    // cross-doc copy cut, own prose survives in order
    assert(got(2L) === ((3L, 1L, "Gamma delta. Another.")))
    // within-doc repeat: only the first instance survives
    assert(got(3L) === ((3L, 1L, "Repeat me. Fresh.")))
    // lowercase + whitespace-collapse normalization keys the dedup
    assert(got(4L) === ((1L, 1L, "")))
    assert(!got.contains(5L)) // null text -> no sentences to judge
  }
  test("dedupSentencesAcrossDocs: STRING doc ids flow through unchanged (no silent long cast)") {
    // the r12 wart: cast('long') turned string ids into NULLs, silently
    // collapsing every doc into one group; the id type must ride through
    val docs = Seq(
      ("doc-a", "Alpha beta. Shared tail!"),
      ("doc-b", "Gamma delta. Shared tail!"))
      .toDF("doc_id", "text")
    val got = TextOps.dedupSentencesAcrossDocs(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === Set("doc-a", "doc-b"))
    assert(got("doc-a") === ((2L, 0L, "Alpha beta. Shared tail!")))
    assert(got("doc-b") === ((2L, 1L, "Gamma delta.")))
  }
  test("removeLines: discovered template lines vanish everywhere; within-doc repeats survive") {
    val docs = Seq(
      (1L, "real prose of doc one\nvisit our help desk today\necho me\necho me"),
      (2L, "visit our help desk today\nother prose"),
      (3L, "untouched content")).toDF("doc_id", "text")
    val hits = TextOps.boilerplateLines(docs) // discovers ONLY the cross-doc line
    val got = TextOps.removeLines(docs, hits.select("line")).collect()
      .map(r => r.getLong(0) -> r).toMap
    // the shared template line dies in every doc; the within-doc
    // repeat (df = 1 distinct doc) is NOT in the hit list and survives
    assert(got(1L).getString(3) === "real prose of doc one\necho me\necho me")
    assert(got(1L).getLong(1) === 4L && got(1L).getLong(2) === 1L)
    assert(got(2L).getString(3) === "other prose")
    assert(got(3L).getLong(2) === 0L && got(3L).getString(3) === "untouched content")
    // empty hit list removes nothing
    val none = TextOps.removeLines(docs, Seq.empty[String].toDF("line")).collect()
    assert(none.forall(_.getLong(2) === 0L))
  }
  test("encodingDamage: planted mojibake detected and repaired; clean/null text untouched") {
    val rows = Seq(
      (1L, "CafÃ© staff said â€™helloâ€™ â€” Â«dailyÂ» reports"),
      (2L, "perfectly clean ascii prose with no damage at all"),
      (3L, "legitimate unicode: café — “quoted” … stays"),
      (4L, null.asInstanceOf[String]),
      // trigram whose third byte is \r: the detector tail is [^\n]
      // (identical in java.util.regex and RE2), NOT '.' (which skips
      // \r only under java) — this row pins the engine-parity fix
      (5L, "x â€\r y"))
    val got = TextOps.encodingDamage(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 6L && got(1L).getBoolean(2))
    assert(got(1L).getString(3) === "Café staff said ’hello’ — «daily» reports")
    assert(got(2L).getLong(1) === 0L && !got(2L).getBoolean(2))
    assert(got(2L).getString(3) === rows(1)._2)
    // real accented/punctuation unicode is NOT damage (lead chars absent)
    assert(got(3L).getLong(1) === 0L && got(3L).getString(3) === rows(2)._2)
    assert(got(4L).getLong(1) === 0L && !got(4L).getBoolean(2) && got(4L).isNullAt(3))
    assert(got(5L).getLong(1) === 1L && got(5L).getBoolean(2))
    // the repair clears every detector hit: re-scan of repaired = 0
    // (row 5 is UNREPAIRABLE damage — â€\r has no repair-table entry —
    // so it is excluded: the detect/repair contract is one layer, and
    // unrepairable rows stay flagged for the composed gate to drop)
    val rescanned = TextOps.encodingDamage(
      TextOps.encodingDamage(rows.toDF("doc_id", "text").filter($"doc_id" =!= 5L))
        .select($"doc_id", $"text_repaired".as("text"))).collect()
    rescanned.foreach(r => assert(r.getLong(1) === 0L))
  }
  test("extractionYield: per-source funnel matches hand-counted lines and chars") {
    // source a: one body line (5 tokens) + one heading (2 tokens,
    // density-dropped); source b: heading only -> zero kept
    val rows = Seq(
      ("a", "<h1>Hi there</h1><p>one two three four five</p>"),
      ("a", "<h1>Yo</h1><p>six seven eight nine ten</p>"),
      ("b", "<h1>Nothing here</h1>"))
    val got = TextOps.extractionYield(rows.toDF("source", "html")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((2L, 4L, 2L)))
    assert(a.getDouble(4) === 0.5)                   // 2 of 4 lines kept
    assert(a.getLong(6) ===
      ("one two three four five".length + "six seven eight nine ten".length).toLong)
    val b = got("b")
    assert((b.getLong(2), b.getLong(3), b.getDouble(4), b.getLong(6), b.getDouble(7)) ===
      ((1L, 0L, 0.0, 0L, 0.0)))
  }

  test("boilerplateLines: shared lines surface with df/doc_share, unique content does not") {
    val rows = Seq(
      (1L, "unique prose of doc one\nvisit our help desk today"),
      (2L, "different prose for doc two\nvisit our help desk today"),
      (3L, "totally fresh content here\nvisit our help desk today"),
      (4L, null.asInstanceOf[String]))
    val got = TextOps.boilerplateLines(rows.toDF("doc_id", "text")).collect()
    assert(got.length === 1)
    assert(got(0).getString(0) === "visit our help desk today")
    assert(got(0).getLong(1) === 3L)
    assert(got(0).getDouble(2) === 0.75)             // 3 of 4 distinct docs
    // a repeated line WITHIN one doc counts that doc once
    val within = Seq((1L, "echo line\necho line"), (2L, "echo line\nother"))
      .toDF("doc_id", "text")
    val w = TextOps.boilerplateLines(within).collect()
    assert(w.length === 1 && w(0).getLong(1) === 2L)
    assert(TextOps.boilerplateLines(rows.toDF("doc_id", "text"), minDf = 4).isEmpty)
  }
}
