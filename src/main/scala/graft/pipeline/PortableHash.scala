package graft.pipeline

/** Portable integer hash kernels for the probabilistic dedup/ANN operators.
  *
  * Everything here is pure integer arithmetic mod M = 1e9+7 (the same scheme
  * `TextAnalysis.winnowFingerprint` uses), chosen so an external SQL engine
  * (the DuckDB correctness oracle) can reproduce every signature, band key,
  * and LSH bucket bit-for-bit: no 64-bit wraparound, no platform RNG, no
  * float accumulation in a sign test. All intermediates stay below 2^63
  * (largest product: (M-1)^2 < 1e18).
  *
  * Hash quality: ~30-bit universal-style hashes. For MinHash/SimHash/
  * random-hyperplane bucketing this is statistically ample (collision
  * probability between two distinct shingles ~1e-9; signature slots use
  * independent (a_i, b_i) multipliers). For adversarial inputs at 100 TB a
  * caller can swap in xxhash64-based kernels — the operators in [[Dedup]] and
  * [[Similarity]] only require that the same family is used corpus-wide.
  */
object PortableHash {

  /** Modulus: the Mersenne-ish prime 1e9+7 (fits all math in Long). */
  val M = 1000000007L

  /** Polynomial rolling hash of a string's UTF-16 code units mod M.
    * SQL equivalent: list_reduce over ascii(substr(...)) — see the p3/p4
    * oracles in CatalogPipeline. */
  def poly(s: String, base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * base + s.charAt(i)) % M; i += 1 }
    h
  }

  def poly31(s: String): Long = poly(s, 31)
  def poly37(s: String): Long = poly(s, 37)

  /** Polynomial rolling hash of a string's Unicode CODE POINTS mod M —
    * what a `list_reduce` over DuckDB's code-point slicing computes.
    * Identical to [[poly]] on BMP text (code unit == code point there);
    * diverges only on astral/emoji input, where [[poly]] folds two
    * surrogate units per character. Operators whose oracle slices
    * characters in SQL must use THIS kernel (DSIR p39, the x4 CMS via
    * `Poly31Hash`); p3/p4 retain the UTF-16 [[poly]] fold under their
    * long-standing DOCUMENTED BMP-only oracle-parity contract — their
    * signatures are pinned by round-1 oracles and changing the fold
    * would re-key every minhash band and simhash bit. */
  def polyCp(s: String, base: Long): Long = {
    var h = 0L
    val it = s.codePoints().iterator()
    while (it.hasNext) { h = (h * base + it.nextInt()) % M }
    h
  }

  def poly31Cp(s: String): Long = polyCp(s, 31)

  /** Multiplier / offset for MinHash permutation slot i: affine maps
    * h -> (a_i*h + b_i) mod M. a_i is never 0 mod M (both factors are
    * nonzero and < M, M prime). */
  def minhashA(i: Int): Long = ((2L * i + 1) * 1103515245L) % M
  def minhashB(i: Int): Long = ((i + 1L) * 12345L) % M

  /** MinHash signature of a shingle set: sig(i) = min over shingles of
    * (a_i * poly31(shingle) + b_i) mod M — one pass per document.
    * Callers must not pass an empty shingle set. */
  def minhashSignature(shingles: Seq[String], numHashes: Int): Array[Long] = {
    require(shingles.nonEmpty, "minhash of an empty shingle set is undefined")
    val hs = shingles.map(poly31)
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = minhashA(i)
      val b = minhashB(i)
      var m = Long.MaxValue
      hs.foreach { h => val v = (a * h + b) % M; if (v < m) m = v }
      sig(i) = m
      i += 1
    }
    sig
  }

  /** LSH band keys: band idx folds its `rows` consecutive signature slots
    * with (acc*31 + v) mod M, seeded with (idx+1) so equal value runs in
    * different bands cannot collide. */
  def bandKeys(sig: Seq[Long], rows: Int): Seq[Long] =
    sig.grouped(rows).zipWithIndex.map { case (band, idx) =>
      var h = (idx + 1).toLong
      band.foreach { v => h = (h * 31 + v) % M }
      h
    }.toSeq

  /** 60-bit SimHash over a word multiset: bits 0..29 from a mixed poly31,
    * bits 30..59 from a mixed poly37 (each hash is < 2^30), sign-summed per
    * bit. The multiplicative mixing round after the polynomial fold is
    * load-bearing: short words never wrap the modulus, so the raw
    * polynomial's high bits correlate with the word's first letters and the
    * sign-sum bits stop being independent (measured ~9x spurious
    * hamming<=3 pairs without it). */
  def simhash60(words: Seq[String]): Long = {
    val acc = new Array[Int](60)
    words.foreach { w =>
      val h1 = (poly31(w) * 2654435761L + 987654321L) % M
      val h2 = (poly37(w) * 1540483477L + 12345701L) % M
      var b = 0
      while (b < 30) {
        if (((h1 >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      while (b < 60) {
        if (((h2 >> (b - 30)) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Deterministic hyperplane component for plane j, dimension i: an
    * integer in [-(M/2), M/2] from a multiplicative hash of (j, i). Used
    * as fixed-point plane coordinates — the random-hyperplane sign test
    * becomes exact integer arithmetic. */
  def planeComponent(j: Int, i: Int): Long =
    ((j.toLong * 4096 + i) * 2654435761L + 987654321L) % M - M / 2

  /** Fixed-point quantization of a vector component: floor(x * 2^20 + 0.5)
    * (floor-of-plus-half, identical in Spark and DuckDB — unlike
    * round-half-away-from-zero). */
  def quantize(x: Float): Long = math.floor(x.toDouble * 1048576.0 + 0.5).toLong

  /** Random-hyperplane signature: bit j = sign(q(v) · plane_j) with the
    * whole dot product in exact integer math (|q| <= ~2^24 per component,
    * |plane| <= M/2, dims <= a few hundred: no overflow, no FP sign
    * ambiguity an external engine could resolve differently). */
  def rhSignature(vec: Seq[Float], numPlanes: Int): Int = {
    var sig = 0
    var j = 0
    while (j < numPlanes) {
      var dot = 0L
      var i = 0
      while (i < vec.length) { dot += quantize(vec(i)) * planeComponent(j, i); i += 1 }
      if (dot >= 0L) sig |= (1 << j)
      j += 1
    }
    sig
  }
}
