package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-walk-per-pass native form of the `TextOps.htmlLines` regex
  * chain — byte-walk replacements for the seven sequential rewrites
  * (script/style strips, comment strip, block-tag→newline, tag strip,
  * entity decode, line split/collapse/trim/filter) that regex
  * machinery paid ~20 full `regexp_replace` passes for. The REGEX
  * chain stays the specification: `HtmlLinesSpec` pins the two equal
  * over the corpus fixtures and adversarial markup, and every
  * extraction oracle row replays the regex semantics in DuckDB.
  *
  * Pass-for-pass equivalence notes (each helper documents its own):
  *   - matches are attempted at every position left-to-right exactly
  *     like `regexp_replace` (a failed candidate emits its `<`/`&`
  *     and resumes at the NEXT byte, so positions inside a failed
  *     candidate are re-attempted — the `<a title="x<p>y">` class);
  *   - all case-insensitive matching is ASCII-only ((?i) without
  *     UNICODE_CASE), so byte comparison is exact; multi-byte UTF-8
  *     units are ≥ 0x80 and never collide with ASCII pattern bytes;
  *   - every rewrite SHRINKS (tag/entity → one char), so one output
  *     buffer of input size serves each pass.
  */
object HtmlText extends Serializable {

  @inline private def lowerB(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  @inline private def isWordB(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  // java.util.regex \s — ASCII [ \t\n\x0B\f\r]
  @inline private def isSpaceB(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0B.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** ASCII-ci region match of lowercase `pat` at `pos`. */
  @inline private def ciMatch(s: Array[Byte], pos: Int, pat: Array[Byte]): Boolean = {
    if (pos + pat.length > s.length) false
    else {
      var k = 0
      while (k < pat.length && lowerB(s(pos + k)) == pat(k)) k += 1
      k == pat.length
    }
  }

  /** `(?is)<name\b[^>]*>.*?</name\s*>` → " " (script/style strip).
    * Open tag: ci name with word boundary, `[^>]*` to the FIRST '>'.
    * Close: the first `</name` followed by `\s*>` (no \b on the
    * close — `</scriptx>` is skipped, `</script >` closes). A
    * candidate with no close (or an unclosed open tag) fails: its
    * '<' leaks as text and scanning resumes at the next byte.
    */
  private def stripElement(s: Array[Byte], name: String): Array[Byte] = {
    val open = ("<" + name).getBytes
    val close = ("</" + name).getBytes
    val n = s.length
    val out = new Array[Byte](n)
    var w = 0
    var i = 0
    while (i < n) {
      val b = s(i)
      if (b == '<' && ciMatch(s, i, open) &&
          (i + open.length >= n || !isWordB(s(i + open.length)))) {
        // [^>]* to first '>'
        var j = i + open.length
        while (j < n && s(j) != '>') j += 1
        var matched = false
        if (j < n) {
          // non-greedy body: first close candidate that completes
          var m = j + 1
          while (!matched && m <= n - close.length) {
            if (s(m) == '<' && ciMatch(s, m, close)) {
              var t = m + close.length
              while (t < n && isSpaceB(s(t))) t += 1
              if (t < n && s(t) == '>') {
                out(w) = ' '; w += 1
                i = t + 1
                matched = true
              } else m += 1
            } else m += 1
          }
        }
        if (!matched) { out(w) = b; w += 1; i += 1 }
      } else {
        out(w) = b; w += 1; i += 1
      }
    }
    if (w == n) s else java.util.Arrays.copyOf(out, w)
  }

  /** `(?s)<!--.*?-->` → " ". */
  private def stripComments(s: Array[Byte]): Array[Byte] = {
    val n = s.length
    val out = new Array[Byte](n)
    var w = 0
    var i = 0
    while (i < n) {
      val b = s(i)
      if (b == '<' && i + 4 <= n && s(i + 1) == '!' && s(i + 2) == '-' && s(i + 3) == '-') {
        // first "-->" at or after i+4
        var m = i + 4
        var end = -1
        while (end < 0 && m <= n - 3) {
          if (s(m) == '-' && s(m + 1) == '-' && s(m + 2) == '>') end = m + 3 else m += 1
        }
        if (end >= 0) { out(w) = ' '; w += 1; i = end }
        else { out(w) = b; w += 1; i += 1 }
      } else { out(w) = b; w += 1; i += 1 }
    }
    if (w == n) s else java.util.Arrays.copyOf(out, w)
  }

  /** The quote-aware tagBody scan: from `from`, consume
    * `(?:[^>"']|"[^"<]*"|'[^'<]*')*` and return the index of the
    * terminating '>' — or -1 when a quoted span is unterminated /
    * crosses '<' / the input ends (the regex candidate fails and the
    * tag leaks as text).
    */
  @inline private def scanTagBody(s: Array[Byte], from: Int): Int = {
    val n = s.length
    var k = from
    while (k < n) {
      val b = s(k)
      if (b == '>') return k
      else if (b == '"' || b == '\'') {
        var m = k + 1
        while (m < n && s(m) != b && s(m) != '<') m += 1
        if (m < n && s(m) == b) k = m + 1 else return -1
      } else k += 1
    }
    -1
  }

  /** The block-tag name set of the `blockNl` pass. */
  private val blockNames: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    Seq("p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
      "tr", "td", "th", "table", "section", "article", "header", "footer",
      "nav", "blockquote", "title", "pre").foreach(h.add)
    h
  }

  /** `(?i)</?(block names)\b` + tagBody + `>` → "\n". The name is the
    * maximal word-char run after `</?` (≡ alternation + \b); a
    * non-block name or failed tagBody leaks the '<' and scanning
    * resumes at the next byte (so a block tag INSIDE another tag's
    * quoted attribute still rewrites, exactly like the regex pass).
    */
  private def blockTagsToNewline(s: Array[Byte]): Array[Byte] = {
    val n = s.length
    val out = new Array[Byte](n)
    var w = 0
    var i = 0
    val nameBuf = new java.lang.StringBuilder(16)
    while (i < n) {
      val b = s(i)
      var emitted = false
      if (b == '<') {
        var j = i + 1
        if (j < n && s(j) == '/') j += 1
        nameBuf.setLength(0)
        while (j < n && isWordB(s(j)) && nameBuf.length() <= 10) {
          nameBuf.append(lowerB(s(j)).toChar)
          j += 1
        }
        // maximal run must end here (an 11+-char run can't be a block name)
        if (nameBuf.length() > 0 && nameBuf.length() <= 10 &&
            (j >= n || !isWordB(s(j))) && blockNames.contains(nameBuf.toString)) {
          val k = scanTagBody(s, j)
          if (k >= 0) {
            out(w) = '\n'; w += 1
            i = k + 1
            emitted = true
          }
        }
      }
      if (!emitted) { out(w) = b; w += 1; i += 1 }
    }
    if (w == n) s else java.util.Arrays.copyOf(out, w)
  }

  /** `(?s)<` + tagBody + `>` → " " (every remaining tag). */
  private def stripTags(s: Array[Byte]): Array[Byte] = {
    val n = s.length
    val out = new Array[Byte](n)
    var w = 0
    var i = 0
    while (i < n) {
      val b = s(i)
      if (b == '<') {
        val k = scanTagBody(s, i + 1)
        if (k >= 0) { out(w) = ' '; w += 1; i = k + 1 }
        else { out(w) = b; w += 1; i += 1 }
      } else { out(w) = b; w += 1; i += 1 }
    }
    if (w == n) s else java.util.Arrays.copyOf(out, w)
  }

  /** The numeric-entity value table (TextOps.numericEntities plus the
    * last-pass &-family 38/0x26): codepoint value → replacement bytes.
    */
  private val entityByValue: java.util.HashMap[Long, Array[Byte]] = {
    val h = new java.util.HashMap[Long, Array[Byte]]()
    Seq(34L -> "\"", 39L -> "'", 60L -> "<", 62L -> ">", 160L -> " ",
      8211L -> "–", 8212L -> "—", 8216L -> "‘",
      8217L -> "’", 8220L -> "“", 8221L -> "”",
      8230L -> "…", 38L -> "&").foreach { case (v, r) =>
      h.put(v, r.getBytes("UTF-8"))
    }
    h
  }

  /** The fused entity pass ≡ the sequential chain: four case-SENSITIVE
    * literal replaces (&nbsp; &lt; &gt; &quot;), twelve case-
    * insensitive numeric patterns (dec+hex, leading zeros), then the
    * &-family (`(?i)&(?:amp|#0*38|#x0*26);`) single-pass LAST. Fusing
    * is sound because every pattern starts at '&' and ends at ';' and
    * no two patterns match the same span, no replacement emits '&',
    * and scanning resumes AFTER a replacement (so decoded '&' cannot
    * re-form an entity — the single-pass &-family contract).
    */
  private def decodeEntities(s: Array[Byte]): Array[Byte] = {
    val n = s.length
    val out = new Array[Byte](n)
    var w = 0
    var i = 0
    while (i < n) {
      val b = s(i)
      var advanced = false
      if (b == '&' && i + 1 < n) {
        if (s(i + 1) == '#') {
          var j = i + 2
          var hex = false
          if (j < n && (s(j) == 'x' || s(j) == 'X')) { hex = true; j += 1 }
          val d0 = j
          var v = 0L
          var overflow = false
          while (j < n && {
            val c = s(j)
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
              else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
              else -1
            if (d >= 0) {
              v = v * (if (hex) 16 else 10) + d
              if (v > 0xFFFFL) overflow = true // far above the table
              j += 1
              true
            } else false
          }) ()
          if (j > d0 && j < n && s(j) == ';' && !overflow) {
            val rep = entityByValue.get(v)
            if (rep != null) {
              System.arraycopy(rep, 0, out, w, rep.length)
              w += rep.length
              i = j + 1
              advanced = true
            }
          }
        } else {
          // named: nbsp/lt/gt/quot case-SENSITIVE; amp case-insensitive
          val rest = n - (i + 1)
          @inline def lit(p: String, rep: Byte, ci: Boolean): Boolean = {
            val pb = p.getBytes
            if (rest < pb.length) false
            else {
              var k = 0
              while (k < pb.length &&
                (if (ci) lowerB(s(i + 1 + k)) == pb(k) else s(i + 1 + k) == pb(k))) k += 1
              if (k == pb.length) {
                out(w) = rep; w += 1
                i = i + 1 + pb.length
                true
              } else false
            }
          }
          advanced = lit("nbsp;", ' ', ci = false) || lit("lt;", '<', ci = false) ||
            lit("gt;", '>', ci = false) || lit("quot;", '"', ci = false) ||
            lit("amp;", '&', ci = true)
        }
      }
      if (!advanced) { out(w) = b; w += 1; i += 1 }
    }
    if (w == n) s else java.util.Arrays.copyOf(out, w)
  }

  /** split('\n') → per line collapse `\s+`→' ' + trim → drop empty
    * (the final `filter(transform(split(...)))` of the chain).
    */
  private def toLines(s: Array[Byte]): GenericArrayData = {
    val n = s.length
    val lines = new scala.collection.mutable.ArrayBuffer[Any](8)
    val buf = new Array[Byte](n)
    var w = 0
    var pendingSep = false
    var i = 0
    @inline def flush(): Unit = {
      if (w > 0) lines += UTF8String.fromBytes(java.util.Arrays.copyOf(buf, w), 0, w)
      w = 0
      pendingSep = false
    }
    while (i < n) {
      val b = s(i)
      if (b == '\n') flush()
      else if (isSpaceB(b)) pendingSep = true
      else {
        if (pendingSep && w > 0) { buf(w) = ' '; w += 1 }
        pendingSep = false
        buf(w) = b; w += 1
      }
      i += 1
    }
    flush()
    new GenericArrayData(lines.toArray)
  }

  /** The full chain: NONEMPTY collapsed/trimmed lines of the visible
    * text (pre-density-filter), ≡ `TextOps.htmlLines`.
    */
  def htmlLines(html: UTF8String): GenericArrayData =
    toLines(decodeEntities(stripTags(blockTagsToNewline(
      stripComments(stripElement(stripElement(html.getBytes, "script"), "style"))))))
}

/** `html_lines(html)` — the native extraction walk (see [[HtmlText]]). */
case class HtmlLinesExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"html_lines needs a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    HtmlText.htmlLines(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HtmlText.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.htmlLines($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlLinesExpression =
    copy(child = newChild)

  override def prettyName: String = "html_lines"
}

object HtmlTextExprs {
  /** Nonempty visible-text lines of an HTML document, ≡ the
    * `TextOps.htmlLines` regex chain.
    */
  def htmlLines(html: Column): Column =
    Bridge.column(HtmlLinesExpression(Bridge.expression(html)))
}
