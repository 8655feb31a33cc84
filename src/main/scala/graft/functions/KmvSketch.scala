package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.geo.SplitMix64

/** KMV (k-minimum-values) distinct-count sketch result.
  * @param n_kept number of distinct hashes retained (≤ k)
  * @param kth    largest retained hash (the k-th order statistic once the
  *               sketch saturates), in the hash's own value space
  * @param est    distinct-count estimate: exact `n_kept` while n < k,
  *               (k−1) · range / kth once saturated */
case class KmvOut(n_kept: Long, kth: Long, est: Double)

/** Mergeable KMV distinct-count sketch (Bar-Yossef et al. 2002): keep the
  * k smallest distinct hash values; the k-th smallest estimates the
  * distinct count as (k−1) · range / h₍ₖ₎. State is O(k) per group — the
  * whole point vs an exact `count(distinct)`, whose shuffle carries every
  * distinct key. Partial aggregation (map-side combine) works because
  * merge is commutative/associative, so at 10^12 rows each task ships one
  * k-sized array per group, never the keys.
  *
  * Determinism: the hash is a pure function and the retained set is a
  * set — the sketch (and therefore the estimate) is bit-identical under
  * any partitioning or row order, unlike sampled estimators.
  *
  * Two hash modes:
  *  - default [[SplitMix64.mix]] over the full unsigned 2^64 space — the
  *    at-scale configuration (uniform, collision-negligible);
  *  - any caller-supplied `(Long ⇒ Long, range)` pair; the oracle-backed
  *    query uses the bijective permutation `(id · 2654435761) mod
  *    1000000007` (ids must be < the modulus — true for the synthetic
  *    tables), which DuckDB replays exactly.
  *
  * Buffer encoding: hashes are stored XOR Long.MinValue so SIGNED array
  * order equals the hash's unsigned order (same trick as Sampling.topk),
  * sorted ascending, ≤ k entries. Once saturated, a non-qualifying row
  * costs ONE comparison against the current maximum.
  */
class KmvSketch(k: Int,
                hash: Long => Long = SplitMix64.mix,
                range: Double = 18446744073709551616.0 /* 2^64 */)
    extends Aggregator[Long, Array[Long], KmvOut] {
  require(k >= 2, s"k must be >= 2, got $k")

  private def flip(h: Long): Long = h ^ Long.MinValue

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], id: Long): Array[Long] = {
    val f = flip(hash(id))
    if (b.length == k && f >= b(k - 1)) return b // saturated fast path
    val idx = java.util.Arrays.binarySearch(b, f)
    if (idx >= 0) return b // duplicate hash
    val ip = -idx - 1
    val n = math.min(b.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(b, 0, out, 0, ip)
    out(ip) = f
    System.arraycopy(b, ip, out, ip + 1, n - ip - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(b: Array[Long]): KmvOut = {
    val n = b.length
    if (n == 0) KmvOut(0L, 0L, 0.0)
    else {
      val kth = flip(b(n - 1))
      val est =
        if (n < k) n.toDouble
        else {
          val kd = if (kth >= 0) kth.toDouble
                   else kth.toDouble + 18446744073709551616.0
          (k - 1).toDouble * range / kd
        }
      KmvOut(n.toLong, kth, est)
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
}
