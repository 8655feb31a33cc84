package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.geo.SplitMix64

/** HyperLogLog result.
  * @param n_zero   empty registers (rank 0) — drives the small-range
  *                 linear-counting correction
  * @param s_scaled Σ 2^−rank over all m registers (empty register → 1.0).
  *                 In replayable mode every term is a dyadic with
  *                 exponent ≥ −23 and the sum needs < 33 mantissa bits,
  *                 so it is EXACT in a double and order-independent —
  *                 the property that lets a plain-SQL oracle replay it
  * @param est      cardinality estimate (Flajolet et al. 2007):
  *                 α_m·m²/s_scaled, replaced by linear counting
  *                 m·ln(m/V) when est ≤ 2.5m and V = n_zero > 0 */
case class HllOut(n_zero: Long, s_scaled: Double, est: Double)

/** Mergeable HyperLogLog distinct-count sketch, m = 256 registers —
  * CONSTANT 256-byte state per group (the KMV sibling
  * [[KmvSketch]] is O(k)); merge is an elementwise register max, so
  * partial aggregation ships one 256-byte array per (task, group) and
  * the sketch is bit-identical under any partitioning or row order.
  *
  * Two modes, mirroring [[KmvSketch]]:
  *  - [[HllSketch.splitmix]]: 64-bit SplitMix64 mixing — the at-scale
  *    configuration. Register = top 8 bits pick the bucket, rank =
  *    leading-zero count of the remaining 56 bits + 1 (∈ [1, 57]).
  *  - [[HllSketch.replayable]]: the quadratic mix
  *    h = (id² mod p)·2654435761 + id mod p (p = 1000000007; ids must
  *    be below the modulus). NOT linear: a linear permutation maps
  *    sequential ids to an arithmetic progression mod p, whose
  *    leading-zero statistics are badly non-geometric (measured 1.8×
  *    overestimate); the degree-2 Weyl-style mix restores ±8%
  *    accuracy at every tested cardinality. It is ~2-to-1 (i collides
  *    with −i−c⁻¹ mod p) — negligible at any n ≪ p, and the oracle
  *    replays the identical map so both sides agree exactly.
  *    Bucket = h mod 256, suffix v = h div 256 < 2^22, rank =
  *    23 − bitlen(v) (v = 0 → 23). Every quantity — registers,
  *    n_zero, the dyadic s_scaled, and the IEEE expression for est —
  *    is exactly replayable by the DuckDB oracle.
  *
  * No large-range correction: replayable mode's domain is far below
  * any 2^64 saturation, and 64-bit-hash collisions are negligible at
  * any achievable cardinality (the classic 2^32-hash correction is an
  * artifact of 32-bit implementations).
  */
class HllSketch private (hash: Long => Long,
                         bucketOf: Long => Int,
                         suffixOf: Long => Long,
                         suffixBits: Int)
    extends Aggregator[Long, Array[Byte], HllOut] {
  private val m = 256
  private def rankOf(v: Long): Byte =
    (suffixBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(v))).toByte

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(b: Array[Byte], id: Long): Array[Byte] = {
    val h = hash(id)
    val bk = bucketOf(h)
    val r = rankOf(suffixOf(h))
    if (r > b(bk)) b(bk) = r
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Byte]): HllOut = {
    // Fixed bucket order: deterministic even where terms are inexact
    // (splitmix mode); in replayable mode the sum is exact dyadic and
    // therefore order-independent — see HllOut.s_scaled.
    var s = 0.0; var zeros = 0L; var i = 0
    while (i < m) {
      val r = b(i)
      if (r == 0) { zeros += 1; s += 1.0 }
      else s += java.lang.Math.scalb(1.0, -r)
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    val raw = alpha * 65536.0 / s
    val est =
      if (raw <= 2.5 * 256.0 && zeros > 0) 256.0 * math.log(256.0 / zeros)
      else raw
    HllOut(zeros, s, est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[HllOut] = Encoders.product[HllOut]
}

object HllSketch {
  /** At-scale mode: SplitMix64 over the full 64-bit space. */
  def splitmix(): HllSketch = new HllSketch(
    SplitMix64.mix, h => (h >>> 56).toInt, h => h & 0x00FFFFFFFFFFFFFFL, 56)

  /** Oracle-replayable mode: quadratic mix (id² mod p)·c + id mod p
    * (inputs must be in [0, 1000000007)). See class doc for why a
    * LINEAR permutation is not usable here. */
  def replayable(): HllSketch = new HllSketch(
    id => (id * id % 1000000007L * 2654435761L + id) % 1000000007L,
    h => (h % 256L).toInt, h => h / 256L, 22)
}
