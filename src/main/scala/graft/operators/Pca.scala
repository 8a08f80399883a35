package graft.operators

/** Exact-integer top-eigenpair extraction for the feature-PCA query
  * (q216): the driver-side half of the "distributed Gram, KB-scale
  * eigensolve" pattern — the same split `spark.mllib`'s `RowMatrix`
  * uses for PCA (the Gram/covariance matrix is one distributed
  * aggregate; the D×D eigenproblem is driver math because D is tiny
  * and data-independent).
  *
  * Everything here is BigInt arithmetic on quantized inputs, mirrored
  * STATEMENT-FOR-STATEMENT by the generated DuckDB oracle (unrolled
  * HUGEINT CTEs), so the cross-engine hash match is exact BY
  * CONSTRUCTION — no float enters the iteration, so there is no
  * summation-order or rounding-boundary residual risk anywhere in the
  * eigensolve (the one float step, correlation quantization, consumes
  * only exact integers, and identical exact inputs give identical
  * IEEE results in both engines).
  *
  * Power iteration with ∞-norm normalization: `v ← rhalf(G·w, max|w|)`
  * keeps every component on the ±GRID integer lattice, so both engines
  * carry identical state at every step. Convergence is spectrum-
  * dependent (rate λ₂/λ₁ per step); the caller fixes the iteration
  * count — both engines compute the identical iterate regardless, so
  * a slow-converging corpus degrades the ANSWER toward the dominant
  * invariant subspace, never the parity.
  */
object Pca {

  /** Loading grid: one millionth — the house 1e-6 quantization grid
    * (q206/q208 precedent), here with zero boundary risk because the
    * rounding is integer rational arithmetic, not float. */
  val Grid: Long = 1000000L

  private val G = BigInt(Grid)

  /** round-half-away-from-zero of num/den as exact integer rational
    * arithmetic (den > 0). Mirrors the oracle's
    * `(2*x + d) // (2*d)` positive-operand floor division (ties go away
    * from zero, matching SQL round()). */
  def rhalf(num: BigInt, den: BigInt): BigInt = {
    require(den > 0, "rhalf: den must be positive")
    if (num.signum >= 0) (2 * num + den) / (2 * den)
    else -((2 * -num + den) / (2 * den))
  }

  /** Quantize a correlation matrix onto the ±Grid lattice from exact
    * centered-moment integers `num(i)(j) = N·P_ij − S_i·S_j`. The only
    * float step in the pipeline: both engines feed the identical exact
    * integers through the identical double expression
    * `Grid·num/sqrt(num_ii·num_jj)` and `floor(x + 0.5)`, so results
    * are bit-identical as long as every |num| fits int64 — the caller
    * must enforce that bound (the oracle raises on it via error()).
    *
    * Throws on a constant feature (zero diagonal — correlation
    * undefined); the oracle's twin guard raises the same way. */
  def corrGrid(num: Array[Array[BigInt]]): Array[Array[BigInt]] = {
    val d = num.length
    (0 until d).foreach { i =>
      require(num(i)(i) > 0,
        s"q216: feature ${i + 1} is constant — correlation undefined; drop it")
    }
    Array.tabulate(d, d) { (i, j) =>
      val dn = math.sqrt(num(i)(i).toDouble * num(j)(j).toDouble)
      val v = Grid.toDouble * num(i)(j).toDouble / dn
      BigInt(if (v >= 0) math.floor(v + 0.5).toLong else -math.floor(-v + 0.5).toLong)
    }
  }

  /** Power iteration from the deterministic symmetry-breaking start
    * `v_i = Grid + i` (an exactly-uniform start can be exactly
    * orthogonal to the top eigenvector — e.g. any matrix whose top
    * eigenvector sums to zero — and power iteration then converges to
    * the SECOND eigenpair silently; the +i tilt gives every eigenvector
    * a nonzero coefficient on any real corpus matrix). Returns the
    * sign-fixed top-eigenvector approximation on the ±Grid lattice and
    * the Rayleigh explained-variance share on the same grid
    * (`(vᵀCv / vᵀv) / trace(C)`, floor-divided in exact integers).
    *
    * Lattice note: components may retain a ±1 residue at the fixed
    * point (round-half-away never decays an exact half to zero) — one
    * millionth of the normalization, and identical in both engines.
    *
    * Sign convention: flipped so the max-|v| component (smallest index
    * on ties) is positive — the oracle's `ORDER BY abs(v) DESC, i`. */
  def powerTop(c: Array[Array[BigInt]], iters: Int): (Array[BigInt], BigInt) = {
    val d = c.length
    def matVec(v: Array[BigInt]): Array[BigInt] =
      Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
    var v = Array.tabulate(d)(i => G + BigInt(i + 1))
    (1 to iters).foreach { _ =>
      val w = matVec(v)
      val m = w.map(_.abs).max
      require(m > 0, "q216: zero iterate — degenerate correlation matrix")
      v = w.map(wi => rhalf(G * wi, m))
    }
    val w = matVec(v)
    val rayNum = (0 until d).map(i => v(i) * w(i)).sum
    val rayDen = v.map(x => x * x).sum
    val trace = (0 until d).map(i => c(i)(i)).sum
    require(rayNum > 0 && trace > 0,
      "q216: non-positive Rayleigh quotient — correlation matrix is not PSD-dominant")
    val evGrid = (rayNum * G) / (rayDen * trace)
    val iStar = (0 until d).maxBy(i => (v(i).abs, BigInt(-i)))
    val sign = if (v(iStar).signum < 0) -1 else 1
    (v.map(_ * sign), evGrid)
  }

  /** Exact Rayleigh numerator/denominator of `v` against `c`:
    * `(vᵀCv, vᵀv)`. Sign-invariant, so it accepts the sign-fixed
    * vector [[powerTop]] returns. */
  def rayleigh(c: Array[Array[BigInt]], v: Array[BigInt]): (BigInt, BigInt) = {
    val d = c.length
    val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
    ((0 until d).map(i => v(i) * w(i)).sum, v.map(x => x * x).sum)
  }

  /** Hotelling deflation on the lattice: with λ₁ = num/den (den = vᵀv),
    * `C₂ = C − num·vvᵀ/den²` scaled to exact integers
    * (`C·den² − num·vvᵀ`) and re-quantized onto ±Grid via [[rhalf]] by
    * its own max — eigenvectors are preserved under the uniform scale,
    * and the re-quantization is the same integer rounding both engines
    * share, so the SECOND power iteration stays exactly mirrored.
    *
    * Magnitude bound (the oracle's HUGEINT budget): |C·den²| ≤
    * Grid·(D·Grid²)² and |num·v_iv_j| ≤ (D·Grid·D·Grid²)·Grid² — for
    * D ≤ 6 the re-quantization numerator 2·Grid·max stays under
    * ~7.2×10³⁷ < HUGEINT max. Larger D needs a coarser grid. */
  def deflate(c: Array[Array[BigInt]], v: Array[BigInt],
      rayNum: BigInt, rayDen: BigInt): Array[Array[BigInt]] = {
    val d = c.length
    require(rayDen > 0, "deflate: zero vector")
    val raw = Array.tabulate(d, d)((i, j) =>
      c(i)(j) * rayDen * rayDen - rayNum * v(i) * v(j))
    val mx = raw.flatten.map(_.abs).max
    require(mx > 0, "deflate: rank-1 matrix — no second component")
    raw.map(_.map(x => rhalf(G * x, mx)))
  }
}
