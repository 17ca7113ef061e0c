package graft.util

/** SplitMix64 — tiny, spec-fixed PRNG (public domain algorithm, Steele et
  * al., "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014).
  * Used instead of platform RNGs so synthetic-data generation is bit-stable
  * across JVMs and partitionings forever.
  */
final class Rng(seed0: Long) {
  private var state: Long = seed0

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def nextInt(bound: Int): Int = {
    require(bound > 0)
    ((nextLong() >>> 1) % bound).toInt
  }

  /** uniform in [0,1) */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

object Rng {
  /** Derive an independent stream for (seed, index) — mix before use so
    * adjacent indices do not correlate. */
  def at(seed: Long, index: Long): Rng = {
    val r = new Rng(seed * 0x9e3779b97f4a7c15L + index * 0xbf58476d1ce4e5b9L + 0x2545f4914f6cdd1dL)
    r.nextLong(); r.nextLong() // warm-up
    r
  }
}
