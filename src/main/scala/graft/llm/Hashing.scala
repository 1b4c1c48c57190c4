package graft.llm

/** Deterministic 64-bit hashing for signature kernels (no RNG state, no
  * seeds outside the arguments — signatures are reproducible across runs
  * and cluster sizes). */
object Hashing {

  /** splitmix64 finalizer — fast, well-mixed. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64 over Unicode code points (surrogate pairs fold as one code
    * point, matching DuckDB's per-character `unicode()` so the HashOracle
    * macros reproduce signatures for supplementary-plane text too). */
  def hashString(s: CharSequence): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      val cp =
        if (Character.isHighSurrogate(c) && i + 1 < n && Character.isLowSurrogate(s.charAt(i + 1))) {
          i += 1
          Character.toCodePoint(c, s.charAt(i))
        } else c.toInt
      h ^= cp
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a 64 over an explicit code-point sequence (first `len` entries
    * of `cps`) — bit-identical to [[hashString]] of the equivalent String,
    * for kernels that already work in decoded code-point arrays (the
    * fuzzy deletion-variant enumeration) and shouldn't re-encode to UTF-16
    * just to hash. */
  def hashCodePoints(cps: Array[Int], len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < len) {
      h ^= cps(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** The j-th hash family member applied to a pre-hashed value. */
  def mix(h: Long, j: Int): Long =
    splitmix64(h ^ (j.toLong * 0x9E3779B97F4A7C15L))

  /** Deterministic ±1 hyperplane component for (plane, dim). */
  def planeSign(plane: Int, dim: Int): Int =
    if ((splitmix64(plane.toLong * 0x2545F4914F6CDD1DL + dim) & 1L) == 1L) 1 else -1
}
