package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass PCA moments over banked 6dp coordinates (`array<long>` of
  * fixed length d): row count, per-dim first-moment sums, and the
  * upper-triangle second-moment sums Σ x_i·x_j — everything
  * `SimilarityOps.pcaTrace` needs, in ONE corpus scan and ONE scalar
  * aggregation.
  *
  * Replaces the two corpus passes the trace cost before: a posexplode
  * (d rows per vector) for the first moments plus a broadcast
  * (i,j)-grid nested-loop join (d(d+1)/2 = 2080 generated rows AND
  * hash-aggregate probes per vector) for the Gramian. Here the d²
  * multiply-adds run as a plain JVM loop inside the aggregator update —
  * no per-cell row machinery at all — so the pass costs d²/2 fused
  * multiply-adds per vector instead of d²/2 joined-row materializations
  * and hash probes.
  *
  * Exactness contract (the order-free-banking discipline): first
  * moments sum as wrapping longs — bit-identical to Spark's
  * `sum(long)` under any row order; second moments accumulate in
  * EXACT signed 128-bit (hi/lo limbs, unsigned-carry add) —
  * value-identical to the `sum(cast(x_i*x_j as decimal(38,0)))` they
  * replace, at any corpus size a decimal(38,0) itself could hold.
  * Merge is elementwise and associative, so partial aggregation is
  * safe. The single output row is driver-sized: 1 + d + 2·d(d+1)/2
  * longs (d = 64 → ~4.2k longs).
  */
final case class VecMomentsBuf(var n: Long, var s: Array[Long],
                               var hi: Array[Long], var lo: Array[Long])

final case class VecMomentsOut(n: Long, s: Seq[Long], hi: Seq[Long], lo: Seq[Long])

final class VecMomentsAggregator(dims: Int)
    extends Aggregator[Array[Long], VecMomentsBuf, VecMomentsOut] {

  private val tri = dims * (dims + 1) / 2

  override def zero: VecMomentsBuf =
    VecMomentsBuf(0L, new Array[Long](dims), new Array[Long](tri), new Array[Long](tri))

  /** hi/lo ← hi/lo + p (signed 128-bit, exact). */
  @inline private def add128(hi: Array[Long], lo: Array[Long], k: Int, p: Long): Unit = {
    val l = lo(k)
    val nl = l + p
    // unsigned carry out of the low limb
    val carry = ((l & p) | ((l | p) & ~nl)) >>> 63
    hi(k) += (p >> 63) + carry
    lo(k) = nl
  }

  override def reduce(b: VecMomentsBuf, x: Array[Long]): VecMomentsBuf = {
    b.n += 1
    var i = 0
    var k = 0
    while (i < dims) {
      val xi = x(i)
      b.s(i) += xi
      var j = i
      while (j < dims) {
        add128(b.hi, b.lo, k, xi * x(j))
        k += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: VecMomentsBuf, b: VecMomentsBuf): VecMomentsBuf = {
    a.n += b.n
    var i = 0
    while (i < dims) { a.s(i) += b.s(i); i += 1 }
    var k = 0
    while (k < tri) {
      // add b's 128-bit cell into a's: low add with carry, then highs
      val l = a.lo(k)
      val p = b.lo(k)
      val nl = l + p
      val carry = ((l & p) | ((l | p) & ~nl)) >>> 63
      a.hi(k) += b.hi(k) + carry
      a.lo(k) = nl
      k += 1
    }
    a
  }

  override def finish(r: VecMomentsBuf): VecMomentsOut =
    VecMomentsOut(r.n, r.s.toSeq, r.hi.toSeq, r.lo.toSeq)

  override def bufferEncoder: Encoder[VecMomentsBuf] = Encoders.product[VecMomentsBuf]
  override def outputEncoder: Encoder[VecMomentsOut] = Encoders.product[VecMomentsOut]
}

object VecMoments {
  /** Reconstruct the exact integer value of one 128-bit cell. */
  def cellValue(hi: Long, lo: Long): java.math.BigInteger =
    java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))

  // NOTE (r14): this aggregator deliberately has NO udaf() wrapper.
  // Spark's typed-Aggregator UDAF path re-encodes the whole
  // (1 + d + d(d+1))-long buffer per input row — measured 4.8 s →
  // 160 s on q246 at sf0.1. `SimilarityOps.pcaTrace` drives it as a
  // per-partition mapPartitions fold instead (one buffer serialized
  // per partition, driver merge).
}
