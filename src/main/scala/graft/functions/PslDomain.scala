package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The COMPLETE publicsuffix.org rule table (the list's own file
  * format, shipped verbatim as a classpath resource) compiled into an
  * O(labels) hash lookup, plus the registrable-domain algorithm over
  * it. This is the static-list twin of
  * [[graft.ops.UrlOps.registeredDomainPsl]] (the broadcast-join form
  * for caller-supplied rule tables): SAME parse, SAME exception-beats-
  * all-else-longest scoring, SAME defaults — a property spec pins the
  * two implementations against each other on hostile hosts, and the
  * oracle-gated q285 pins this one against a DuckDB replay of the join
  * algorithm over the full table.
  *
  * Table shape: rule suffix → the score band the join variant uses
  * (ps_len, +1000 for exceptions). A suffix can carry MORE than one
  * rule (`kobe.jp` is both a normal rule's suffix and `*.kobe.jp`'s
  * match suffix), and eligibility depends on the host's label count
  * (`n >= ps_len`), so the value is the small score array, not one
  * int.
  */
object PslTable {

  /** The full rule list, loaded once per JVM from the embedded
    * publicsuffix.org snapshot (comments and blanks stripped — the
    * list's documented file format).
    */
  lazy val rules: Seq[String] = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
    finally in.close()
  }

  /** (match suffix → eligible score bands), scores banded exactly like
    * the join variant: ps_len, +1000 when the rule is an exception.
    */
  private lazy val table: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](rules.size * 2)
    rules.foreach { r =>
      val (sfx, psLen, isExc) = graft.ops.UrlOps.parsePslRule(r)
      val score = if (isExc) psLen + 1000 else psLen
      val prev = m.get(sfx)
      m.put(sfx, if (prev == null) Array(score) else prev :+ score)
    }
    m
  }

  private def isIpv4(h: String): Boolean = {
    // the join variant's regex ^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$
    var dots = 0; var digits = 0; var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      if (c == '.') { if (digits == 0) return false; dots += 1; digits = 0 }
      else if (c >= '0' && c <= '9') digits += 1
      else return false
      i += 1
    }
    dots == 3 && digits > 0
  }

  /** Registrable domain of a raw host by the full public-suffix
    * algorithm — byte-identical to
    * [[graft.ops.UrlOps.registeredDomainPsl]] with [[rules]]:
    * lowercase, strip trailing dots, match every right-anchored label
    * suffix against the table (eligible when the host has at least
    * ps_len labels), exception beats all else longest, no match
    * defaults to ps_len 1; IPv4 literals and hosts that ARE a public
    * suffix register as themselves.
    */
  def regDomain(raw: String): String = {
    // ASCII-only lowercase: hosts reach this tier already lowercased
    // by urlNormalize (Spark `lower`), and unicode case folding parity
    // across engines is deliberately NOT part of the determinism
    // tier's contract (the q282 idnFixture convention)
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == '.') end -= 1
    val h = sb.substring(0, end)
    if (isIpv4(h)) return h
    val labs = h.split("\\.", -1)
    val n = labs.length
    var best = -1
    var sfx = ""
    var k = 1
    while (k <= n) {
      sfx = if (k == 1) labs(n - 1) else labs(n - k) + "." + sfx
      val scores = table.get(sfx)
      if (scores != null) {
        var j = 0
        while (j < scores.length) {
          val s = scores(j)
          val psLen = if (s >= 1000) s - 1000 else s
          if (n >= psLen && s > best) best = s
          j += 1
        }
      }
      k += 1
    }
    val ps = if (best < 0) 1 else if (best >= 1000) best - 1000 else best
    if (n > ps) {
      val b = new java.lang.StringBuilder
      var i2 = n - ps - 1
      while (i2 < n) {
        if (b.length > 0) b.append('.')
        b.append(labs(i2))
        i2 += 1
      }
      b.toString
    } else h
  }

  /** UTF8String entry point for generated code. */
  def regDomainU(raw: UTF8String): UTF8String =
    UTF8String.fromString(regDomain(raw.toString))
}

/** `psl_domain(host)` — registrable domain by the FULL public-suffix
  * list as a native Catalyst expression: the 9.5k-rule table is a
  * per-JVM static ([[PslTable]]), so the expression is map-only, stays
  * inside whole-stage codegen, and adds NO join or shuffle to its
  * consumers — the reason [[graft.ops.UrlOps]]' domain-keyed operators
  * (caps/blocklist/frontier/param/idn reports) route through it rather
  * than the broadcast-join form.
  */
case class PslDomainExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"psl_domain needs a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    PslTable.regDomainU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PslTable.regDomainU($c);")

  override protected def withNewChildInternal(newChild: Expression): PslDomainExpression =
    copy(child = newChild)

  override def prettyName: String = "psl_domain"
}

object PslDomain {
  /** Column entry point. */
  def apply(host: Column): Column =
    Bridge.column(PslDomainExpression(Bridge.expression(host)))
}
