package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-shingle coding for the dedup hot path.
  *
  * The normalized-text alphabet is exactly {a-z, 0-9, space} (37 chars —
  * see `TextOps.normalized`), so a k-shingle maps BIJECTIVELY to a
  * base-38 long (char codes 1..37, 0 for absent right-pad positions;
  * fits a long for k ≤ 12). That bijection means the codes ARE the
  * shingles: coded-set sizes equal string-set sizes, and the codes can
  * serve directly as MinHash base "hashes" — universal-hash
  * permutations `(a·x + b) mod P` provide the randomization, so no
  * cryptographic digest is needed anywhere in the chain.
  *
  * Replacing the md5-per-shingle pipeline (cast to binary → md5 → hex
  * substring → base-16 conv, one digest + several string allocations
  * per shingle × ~1k shingles per document) with one rolling byte-walk
  * per document is the difference between the dedup chain being
  * hash-bound and being I/O-bound. The DuckDB oracle computes the
  * identical code arithmetically (`ascii(substr(...))` per position),
  * keeping hash-level parity.
  *
  * Both expressions compute per-row results via a single static helper
  * call — the loop runs as plain JVM bytecode inside whole-stage
  * codegen, with no per-element Catalyst evaluation.
  *
  * PRECONDITION: input must be `TextOps.normalized` output (ASCII-only,
  * single-byte chars). Bytes outside the alphabet map deterministically
  * (same CASE arms as the oracle SQL) but carry no bijection guarantee.
  */
object ShingleCodes extends Serializable {

  /** First prime above 2^32 — MinHash universal-hash modulus. */
  val MinHashP = 4294967311L

  /** Per-permutation universal-hash coefficients. */
  def minHashCoeffs(i: Int): (Long, Long) = (2L * i + 1, 104729L * i + 12345L)

  def pow38(e: Int): Long = (0 until e).foldLeft(1L)((acc, _) => acc * 38)

  /** ascii byte → base-38 digit: ' '→1, '0'-'9'→2-11, 'a'-'z'→12-37.
    * Mirrors the oracle CASE: a=32→1, a<=57→a-46, else a-85.
    */
  @inline private def digit(b: Byte): Long =
    if (b == 32) 1L else if (b <= 57) (b - 46).toLong else (b - 85).toLong

  /** All k-shingle codes of `s` in order (multiset — one per position).
    * A string shorter than k (including "") yields its single
    * zero-right-padded code, matching `substr(s, i, k)` semantics where
    * absent chars read as code 0.
    */
  def codes(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n <= k) {
      var c = 0L
      var i = 0
      while (i < n) { c = c * 38 + digit(bytes(i)); i += 1 }
      while (i < k) { c = c * 38; i += 1 }
      return Array(c)
    }
    val out = new Array[Long](n - k + 1)
    val top = pow38(k - 1)
    var c = 0L
    var i = 0
    while (i < k) { c = c * 38 + digit(bytes(i)); i += 1 }
    out(0) = c
    var p = 1
    while (p <= n - k) {
      c = (c - digit(bytes(p - 1)) * top) * 38 + digit(bytes(p + k - 1))
      out(p) = c
      p += 1
    }
    out
  }

  /** Sorted-distinct k-shingle codes — the exact-Jaccard set shape
    * (feeds `SetExprs.sortedIntersectSize` directly).
    */
  def sortedDistinctCodes(s: UTF8String, k: Int): Array[Long] = {
    val cs = codes(s, k)
    java.util.Arrays.sort(cs)
    var w = 1
    var i = 1
    while (i < cs.length) {
      if (cs(i) != cs(w - 1)) { cs(w) = cs(i); w += 1 }
      i += 1
    }
    if (w == cs.length) cs else java.util.Arrays.copyOf(cs, w)
  }

  /** Whole MinHash signature in one byte-walk: for each shingle code,
    * update the running min of every universal-hash permutation. No
    * shingle array, no explode, no aggregation shuffle — signatures are
    * map-only per document.
    */
  def minHashSig(s: UTF8String, k: Int, numHashes: Int): Array[Long] = {
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      val (a, b) = minHashCoeffs(h); as(h) = a; bs(h) = b; h += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val bytes = s.getBytes
    val n = bytes.length

    @inline def update(code: Long): Unit = {
      var i = 0
      while (i < numHashes) {
        val v = (code * as(i) + bs(i)) % MinHashP
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }

    if (n <= k) {
      var c = 0L
      var i = 0
      while (i < n) { c = c * 38 + digit(bytes(i)); i += 1 }
      while (i < k) { c = c * 38; i += 1 }
      update(c)
    } else {
      val top = pow38(k - 1)
      var c = 0L
      var i = 0
      while (i < k) { c = c * 38 + digit(bytes(i)); i += 1 }
      update(c)
      var p = 1
      while (p <= n - k) {
        c = (c - digit(bytes(p - 1)) * top) * 38 + digit(bytes(p + k - 1))
        update(c)
        p += 1
      }
    }
    mins
  }
}

/** `shingle_codes(norm, k)` → array<bigint> of base-38 shingle codes;
  * `sortedDistinct = true` returns the ascending distinct set.
  */
case class ShingleCodesExpression(child: Expression, k: Int, sortedDistinct: Boolean)
    extends UnaryExpression {
  require(k >= 1 && k <= 12, s"shingle_codes needs 1 <= k <= 12 (38^k must fit a long), got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_codes needs a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val arr = if (sortedDistinct) ShingleCodes.sortedDistinctCodes(s, k)
              else ShingleCodes.codes(s, k)
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ShingleCodes.getClass.getName + ".MODULE$" // ShingleCodes$ class carries MODULE$
    val fn = if (sortedDistinct) "sortedDistinctCodes" else "codes"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($helper.$fn($c, $k));")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleCodesExpression =
    copy(child = newChild)

  override def prettyName: String = "shingle_codes"
}

/** `minhash_sig(norm)` → array<bigint> of `numHashes` MinHash values
  * over base-38 k-shingle codes, computed in one pass per row.
  */
case class MinHashSigExpression(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  // k <= 11, tighter than the code bound: the permutation multiply
  // code*a must also fit a long (max code 38^k−1 times the largest
  // coefficient 2*numHashes−1). At k=12 it wraps negative — silently in
  // the JVM, as a BIGINT overflow error in the DuckDB oracle.
  require(k >= 1 && k <= 11, s"minhash_sig needs 1 <= k <= 11 (code*coeff must fit a long), got $k")
  require(numHashes >= 1 && numHashes <= 64, s"minhash_sig needs 1 <= numHashes <= 64, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleCodes.minHashSig(input.asInstanceOf[UTF8String], k, numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ShingleCodes.getClass.getName + ".MODULE$" // ShingleCodes$ class carries MODULE$
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($helper.minHashSig($c, $k, $numHashes));")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object ShingleExprs {
  /** Base-38 k-shingle codes of a normalized-text column. */
  def shingleCodes(norm: Column, k: Int, sortedDistinct: Boolean = false): Column =
    Bridge.column(ShingleCodesExpression(Bridge.expression(norm), k, sortedDistinct))

  /** One-pass MinHash signature of a normalized-text column. */
  def minHashSig(norm: Column, k: Int = 8, numHashes: Int = 16): Column =
    Bridge.column(MinHashSigExpression(Bridge.expression(norm), k, numHashes))
}
