package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Mergeable Count–Min frequency sketch (Cormode & Muthukrishnan 2005):
  * `d` rows of `w` exact counters; a key increments one counter per row
  * (`((key·a_j + b_j) mod p) mod w`), and its frequency estimate is the
  * MINIMUM of its `d` counters — an overestimate, never an
  * underestimate, with error ≤ εN at probability 1−δ for w = ⌈e/ε⌉,
  * d = ⌈ln 1/δ⌉.
  *
  * State is a CONSTANT d·w Long array (16 KB at the 4×512 default)
  * regardless of input size or key cardinality — the point vs an exact
  * `groupBy(key).count`, whose shuffle carries every distinct key.
  * merge is elementwise sum (commutative/associative), so map-side
  * combine ships one array per task and the sketch is bit-identical
  * under any partitioning or row order.
  *
  * The row hashes are pairwise-independent affine maps over the prime
  * field p = 1000000007 with public xxHash/Knuth multipliers — pure
  * 64-bit integer arithmetic (keys must be < p and small enough that
  * key·a fits in a Long, true for every synthetic id column), which a
  * plain-SQL oracle replays exactly.
  *
  * Reference analog: the frequency/`value_counts` interfaces the
  * reference exposes via numpy (`geoutils/raster/raster.py` histogram
  * paths) done one-pass at constant memory for 100 TB streams.
  */
class CmSketch(val d: Int = 4, val w: Int = 512)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(d >= 1 && d <= CmSketch.A.length, s"d must be in [1, ${CmSketch.A.length}]")
  require(w >= 2, s"w must be >= 2")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    var j = 0
    while (j < d) {
      b(j * w + CmSketch.bucket(key, j, w)) += 1L
      j += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = CmSketch.longArray
  override def outputEncoder: Encoder[Array[Long]] = CmSketch.longArray
}

object CmSketch {
  /** Row-hash multipliers/offsets: xxHash32/64 primes and Knuth's
    * multiplicative constant — public, fixed, and oracle-visible. */
  val A: Array[Long] = Array(2654435761L, 2246822519L, 3266489917L, 668265263L)
  val B: Array[Long] = Array(97L, 1013L, 65537L, 20117L)
  val P: Long = 1000000007L

  def bucket(key: Long, j: Int, w: Int): Int =
    (((key * A(j) + B(j)) % P) % w).toInt

  /** Column expression for row-j's flattened counter slot (1-based, for
    * `element_at`) of `key` in a d×w sketch — the same arithmetic the
    * SQL oracle replays. */
  def slotCol(key: Column, j: Int, w: Int): Column =
    (lit(j.toLong * w + 1) + ((key * lit(A(j)) + lit(B(j))) % lit(P)) % lit(w.toLong))
      .cast("int")

  /** Point-query estimates for every key in `candidates(keyCol)` against
    * the sketch of `df(keyCol)`: builds ONE d·w sketch row (constant
    * bytes), broadcasts it, and takes the min of the d counters per
    * candidate in pure codegen (`least` of `element_at`s) — the classic
    * "CM + candidate scan" heavy-hitter pattern; no per-key state ever
    * shuffles. */
  def estimate(df: DataFrame, candidates: DataFrame, keyCol: String,
               d: Int = 4, w: Int = 512): DataFrame = {
    val sk = udaf(new CmSketch(d, w))
    val sketch = df.agg(sk(col(keyCol)).as("sk"))
    val est = least((0 until d).map(j => element_at(col("sk"), slotCol(col(keyCol), j, w))): _*)
    candidates.crossJoin(broadcast(sketch)).select(col(keyCol), est.as("est"))
  }

  /** A real `array<bigint>` encoder — the result column must be a Spark
    * array for `element_at`, not an opaque binary blob. */
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
