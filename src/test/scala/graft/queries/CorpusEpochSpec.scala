package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[CorpusEpochs]] registry: for EACH epoch, the corpus
  * range whose guarantee the static unroll carries and the documented
  * past-boundary behavior (r15, the r14 verdict #6 — one anchor, one
  * spec-pinned table; the loud-fail runtime drill itself lives in
  * BandScheduleSpec, next to the recall math it protects). Pure driver
  * math — no SparkSession. */
class CorpusEpochSpec extends AnyFunSuite {

  test("the registry lists every epoch and each carries a sane envelope") {
    assert(CorpusEpochs.all.map(_.name).distinct.size === CorpusEpochs.all.size)
    CorpusEpochs.all.foreach { e =>
      assert(e.minBits >= 1 && e.minBits < e.guaranteedBits, e.name)
      assert(e.target >= 1, e.name)
      assert(e.boundary === (e.target.toLong << e.guaranteedBits), e.name)
      assert(e.pastBoundary.nonEmpty, e.name)
    }
  }

  test("NearDup: recall-guaranteed through ~16.8M vectors, loud failure past") {
    val e = CorpusEpochs.NearDup
    // the epoch table row: corpus range [1, 16·2^20] at R* ≥ 0.95,
    // cosine 0.89 — BandScheduleSpec proves the band math; this spec
    // pins the envelope values so a drive-by edit is loud
    assert(e.boundary === 16L * (1L << 20))
    assert(e.boundary >= 10000000L, "must cover the 10^7-vector requirement")
    assert(CorpusEpochs.NearDupRecallTarget === 0.95)
    assert(CorpusEpochs.NearDupDesignCosine === 0.89)
    assert(e.pastBoundary.contains("raise_error"))
    // the frozen plane-table layout: changing this re-keys every
    // existing bucket (and every committed gate hash) — never widen it
    assert(CorpusEpochs.NearDupPlaneStride === 24)
  }

  test("KnnBucket: population-bounded through 2^30 vectors, graceful clip past") {
    val e = CorpusEpochs.KnnBucket
    // the epoch table row: corpus range [1, 64·2^24 = 2^30] at expected
    // bucket population ≤ 64; past it bits clip and population grows
    // linearly in N/2^30 — a runtime bound, results stay correct, so
    // clipping (not raising) is the documented contract
    assert(e.boundary === (1L << 30))
    assert(e.target === 64)
    assert(e.pastBoundary.contains("clip"))
  }

  test("per-epoch resolution: every corpus inside the boundary lands on a carried width") {
    CorpusEpochs.all.foreach { e =>
      def resolve(n: Long): Int =
        (e.minBits to e.guaranteedBits)
          .find(b => n <= (e.target.toLong << b))
          .getOrElse(sys.error(s"${e.name}: n=$n outside the epoch"))
      // band-boundary edges resolve exactly, and the boundary itself
      // resolves to the epoch edge — the same exact-integer chain both
      // dialects embed (duckBitsExpr / bitsForCorpusCol)
      (e.minBits until e.guaranteedBits).foreach { b =>
        val hi = e.target.toLong << b
        assert(resolve(hi) === b, s"${e.name}: upper edge of bits=$b")
        assert(resolve(hi + 1) === b + 1, s"${e.name}: lower edge of bits=${b + 1}")
      }
      assert(resolve(e.boundary) === e.guaranteedBits, e.name)
    }
  }
}
