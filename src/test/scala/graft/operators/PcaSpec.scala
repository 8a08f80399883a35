package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the exact-integer eigensolver behind q216. The
  * cross-engine parity claim is "no float enters the iteration", so
  * these tests pin the integer arithmetic itself: the rational
  * rounding rule, the correlation quantization bounds, and the power
  * iteration against closed-form and double-precision references.
  */
class PcaSpec extends AnyFunSuite {

  private val G = BigInt(Pca.Grid)

  test("rhalf rounds half away from zero, exactly, both signs") {
    assert(Pca.rhalf(5, 2) === BigInt(3))    // 2.5 → 3
    assert(Pca.rhalf(-5, 2) === BigInt(-3))  // −2.5 → −3
    assert(Pca.rhalf(7, 2) === BigInt(4))    // 3.5 → 4
    assert(Pca.rhalf(1, 3) === BigInt(0))    // 0.333 → 0
    assert(Pca.rhalf(2, 3) === BigInt(1))    // 0.667 → 1
    assert(Pca.rhalf(-1, 3) === BigInt(0))
    assert(Pca.rhalf(0, 7) === BigInt(0))
  }

  test("rhalf matches BigDecimal HALF_UP on pseudo-random rationals") {
    var seed = 0x5eed5eedL
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    (1 to 2000).foreach { _ =>
      val num = BigInt(next() % 1000000000L)
      val den = BigInt((next() % 999983L).abs + 1)
      val want = (BigDecimal(num) / BigDecimal(den))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
      assert(Pca.rhalf(num, den) === want, s"$num / $den")
    }
  }

  test("corrGrid: unit diagonal on the grid, symmetric, |entries| ≤ Grid") {
    // moments of 4 customers × 3 features, computed exactly by hand:
    // f = (1,2,3), (2,4,5), (3,6,8), (4,8,9) — f2 = 2·f1 exactly would be
    // constant correlation 1; perturb nothing, that's a legal extreme
    val f = Seq(Seq(1L, 2L, 3L), Seq(2L, 4L, 5L), Seq(3L, 6L, 8L), Seq(4L, 8L, 9L))
    val d = 3
    val n = BigInt(f.size)
    val p = Array.tabulate(d, d)((i, j) =>
      f.map(r => BigInt(r(i)) * BigInt(r(j))).sum)
    val s = Array.tabulate(d)(i => f.map(r => BigInt(r(i))).sum)
    val num = Array.tabulate(d, d)((i, j) => n * p(i)(j) - s(i) * s(j))
    val c = Pca.corrGrid(num)
    (0 until d).foreach { i =>
      assert(c(i)(i) === G, s"diag $i")
      (0 until d).foreach { j =>
        assert(c(i)(j) === c(j)(i), s"symmetry $i $j")
        assert(c(i)(j).abs <= G, s"Cauchy–Schwarz bound $i $j")
      }
    }
    assert(c(0)(1) === G) // f2 = 2·f1: correlation exactly 1
  }

  test("corrGrid raises on a constant feature") {
    val num = Array(Array(BigInt(4), BigInt(0)), Array(BigInt(0), BigInt(0)))
    val e = intercept[IllegalArgumentException](Pca.corrGrid(num))
    assert(e.getMessage.contains("constant"))
  }

  test("powerTop: diagonal matrix — top eigenpair on the grid (±1 lattice residue)") {
    val c = Array(Array(2 * G, BigInt(0)), Array(BigInt(0), G))
    val (v, ev) = Pca.powerTop(c, 48)
    // the minor component decays by halving; round-half-away pins an
    // exact half at 1 — the documented ±1 lattice residue
    assert(v(0) === G && v(1).abs <= BigInt(1), s"got ${v.toSeq}")
    // λ/trace = 2/3 → floor to the grid
    assert((ev - BigInt(666666)).abs <= BigInt(1), s"ev=$ev")
  }

  test("powerTop: all-ones matrix — uniform eigenvector, full share") {
    val c = Array.fill(3, 3)(G)
    val (v, ev) = Pca.powerTop(c, 8)
    assert(v.toSeq === Seq(G, G, G))
    assert(ev === G) // λ = 3G, trace = 3G → share exactly 1
  }

  test("powerTop: escapes a start orthogonal to the top eigenvector, sign fixed") {
    // [[2G, −G],[−G, 2G]]: eigenvectors (1,−1)/√2 (λ=3G) and (1,1)/√2
    // (λ=G). A uniform start is EXACTLY the second eigenvector — the
    // symmetry-breaking +i tilt must escape it, and the sign convention
    // must land the max-|v| component positive
    val c = Array(Array(2 * G, -G), Array(-G, 2 * G))
    val (v, ev) = Pca.powerTop(c, 64)
    assert(v(0) === G && (v(1) + G).abs <= BigInt(2), s"got ${v.toSeq}")
    assert((ev - BigInt(750000)).abs <= BigInt(1), s"ev=$ev") // 3G / 4G
  }

  test("rayleigh: exact quotient pieces, sign-invariant") {
    val c = Array(Array(2 * G, BigInt(0)), Array(BigInt(0), G))
    val v = Array(G, BigInt(0))
    val (num, den) = Pca.rayleigh(c, v)
    assert(num === 2 * G * G * G && den === G * G)
    val (num2, den2) = Pca.rayleigh(c, v.map(-_))
    assert(num2 === num && den2 === den)
  }

  test("deflate removes the top component: second iteration finds eigenpair 2") {
    // [[3G, G],[G, 3G]]: eigenpairs (1,1)/λ=4G and (1,−1)/λ=2G
    val c = Array(Array(3 * G, G), Array(G, 3 * G))
    val (v1, ev1) = Pca.powerTop(c, 64)
    assert(v1(0) === G && (v1(1) - G).abs <= BigInt(2), s"v1=${v1.toSeq}")
    assert((ev1 - BigInt(666666)).abs <= BigInt(2)) // 4G / 6G
    val (n1, d1) = Pca.rayleigh(c, v1)
    val c2 = Pca.deflate(c, v1, n1, d1)
    val (v2, _) = Pca.powerTop(c2, 64)
    assert(v2(0) === G && (v2(1) + G).abs <= BigInt(2), s"v2=${v2.toSeq}")
    // PC2 priced on the ORIGINAL matrix: 2G / 6G
    val (n2, d2) = Pca.rayleigh(c, v2)
    val ev2 = (n2 * G) / (d2 * (6 * G))
    assert((ev2 - BigInt(333333)).abs <= BigInt(2), s"ev2=$ev2")
  }

  test("deflate raises on a rank-1 matrix (no second component)") {
    // vvᵀ itself: deflating its own top component zeroes everything
    val v = Array(G, G)
    val c = Array.tabulate(2, 2)((i, j) => v(i) * v(j) / G)
    val (v1, _) = Pca.powerTop(c, 16)
    val (n1, d1) = Pca.rayleigh(c, v1)
    val e = intercept[IllegalArgumentException](Pca.deflate(c, v1, n1, d1))
    assert(e.getMessage.contains("rank-1"))
  }

  test("powerTop agrees with a double-precision reference on a dense PSD matrix") {
    // deterministic B, C = BᵀB (PSD), integer entries; compare against
    // 512 double power-iteration steps
    val d = 6
    var seed = 0xc0ffeeL
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 40) % 100 }
    val b = Array.fill(d, d)(0L).map(_.map(_ => next() - 50))
    val c = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => BigInt(b(k)(i)) * BigInt(b(k)(j))).sum * G / (50 * 50 * d))
    val (v, _) = Pca.powerTop(c, 96)
    var ref = Array.fill(d)(1.0)
    val cd = c.map(_.map(_.toDouble))
    (1 to 512).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => cd(i)(j) * ref(j)).sum)
      val m = w.map(math.abs).max
      ref = w.map(_ / m)
    }
    val vd = v.map(_.toDouble)
    val cos = (0 until d).map(i => vd(i) * ref(i)).sum /
      (math.sqrt(vd.map(x => x * x).sum) * math.sqrt(ref.map(x => x * x).sum))
    assert(math.abs(cos) >= 0.9999, s"cos=$cos grid=${v.toSeq} ref=${ref.toSeq}")
  }
}
