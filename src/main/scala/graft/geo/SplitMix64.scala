package graft.geo

/** Deterministic 64-bit mixing — bit-exact port of the reference's
  * chunk-invariant sampling key (geoutils `stats/sampling.py:95-133`,
  * `_splitmix64`). Used everywhere randomness must be independent of
  * partitioning: sampling keys, synthetic fixture generation, LSH planes.
  */
object SplitMix64 {
  final val GOLDEN: Long = 0x9e3779b97f4a7c15L

  /** One splitmix64 step: state advance + output mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Keyed hash: hash of a global linear index under a seed — the
    * reference's sampling key (seeded, position-stable):
    * splitmix64(seed ^ gid), `stats/sampling.py:229`. Keys compare in
    * UNSIGNED 64-bit order on the reference side — order by
    * `hash ^ Long.MinValue` (see Sampling.topk). */
  @inline def hash(index: Long, seed: Long): Long = mix(seed ^ index)

  /** Uniform double in [0,1) from a keyed hash. */
  @inline def uniform(index: Long, seed: Long): Double =
    (hash(index, seed) >>> 11).toDouble / (1L << 53).toDouble

  /** Deterministic stream: element i of stream `seed`. */
  def gaussianPair(index: Long, seed: Long): (Double, Double) = {
    // Box-Muller over two independent uniforms; used for LSH planes.
    val u1 = math.max(uniform(index, seed), 1e-300)
    val u2 = uniform(index, seed + 0x632be59bd9b4e019L)
    val r = math.sqrt(-2.0 * math.log(u1))
    (r * math.cos(2 * math.Pi * u2), r * math.sin(2 * math.Pi * u2))
  }
}
