package graft.queries

/** THE CORPUS EPOCHS — the single anchor for every adaptive-LSH
  * schedule's static-width constants (r15, the r14 verdict #6: these
  * lived as scattered privates with the analytic tables in scaladoc;
  * now one documented object carries them and [[CorpusEpochSpec]]
  * pins, for each epoch, the corpus range whose guarantee it carries).
  *
  * An epoch is a COMPILE-TIME promise about a RUN-TIME adaptive
  * schedule. The schedules themselves derive per-band bit width (and,
  * for the near-dup family, band count and verify threshold) from one
  * corpus-count aggregate, so they need no constants at all — except
  * that the band/bucket expressions are STATIC UNROLLS (so the DuckDB
  * oracle stays expressible and the generated code stays fused), and a
  * static unroll has a width. The epoch names the largest corpus whose
  * full schedule requirement that width carries, and what happens one
  * row past it:
  *
  *  - [[NearDup]] (q34/q51/q59/q133/q220/q226/q232/q239 — the banded
  *    sign-LSH screen): guarantee is CANDIDATE RECALL ≥ recallTarget
  *    at designCosine. Bands = ⌈ln(1−R*)/ln(1−p₁^bits)⌉ grow with
  *    bits, so the unroll width is derived at the epoch edge
  *    (bandsForBits(guaranteedBits) = 78) and recall holds with NO
  *    carve-out for every corpus ≤ boundary ≈ 16.8M vectors. PAST the
  *    boundary the screen FAILS LOUDLY in both dialects
  *    (VectorQueries.ndBitsCol / duckNdBitsExpr) — a recall promise
  *    that silently degrades is the r14 weak flag this replaces.
  *  - [[KnnBucket]] (q217/q220 single-bucket kNN sites): guarantee is
  *    EXPECTED BUCKET POPULATION ≤ target (a runtime bound, not a
  *    recall bound — single-bucket recall only improves as buckets
  *    grow). Bits CLIP at guaranteedBits past the boundary ≈ 2^30
  *    vectors: population, and with it per-bucket cost, then grows
  *    linearly in N/2^30 while results stay correct — degradation is
  *    graceful in the runtime dimension, so clipping (not raising) is
  *    the right contract here, and the spec states it.
  *
  * Widening an epoch: raise guaranteedBits (NearDup cost is linear in
  * the derived band count; KnnBucket cost is one more CASE arm).
  * [[NearDup.planeStride]] is the FROZEN plane-table layout — widening
  * must never re-key existing buckets, so the stride never changes.
  */
private[graft] object CorpusEpochs {

  /** One adaptive-LSH schedule's compile-time envelope.
    * `boundary` = target·2^guaranteedBits is the largest corpus count
    * the static unroll carries at full guarantee. */
  final case class Epoch(
      name: String,
      minBits: Int,
      guaranteedBits: Int,
      target: Int,
      pastBoundary: String) {
    def boundary: Long = target.toLong << guaranteedBits
  }

  /** Banded sign-LSH near-dup screen: recall ≥ 0.95 at cosine 0.89
    * through ~16.8M vectors, loud failure past it. */
  val NearDup: Epoch = Epoch(
    name = "near-dup sign-LSH (banded)",
    minBits = 4,
    guaranteedBits = 20,
    target = 16,
    pastBoundary = "raise_error in both dialects")

  /** Recall contract carried inside the NearDup boundary. */
  val NearDupDesignCosine = 0.89
  val NearDupRecallTarget = 0.95

  /** FROZEN plane-window layout (band·stride + r plane indexing):
    * epoch widening must never re-key existing buckets. */
  val NearDupPlaneStride = 24

  /** Single-bucket kNN sites: expected bucket population ≤ 64 through
    * 2^30 vectors; bits clip past it (population grows linearly,
    * results stay correct — runtime degradation only). */
  val KnnBucket: Epoch = Epoch(
    name = "single-bucket kNN",
    minBits = 4,
    guaranteedBits = 24,
    target = 64,
    pastBoundary = "bits clip; bucket population grows linearly")

  /** The registry the spec iterates: every epoch in the codebase. */
  val all: Seq[Epoch] = Seq(NearDup, KnnBucket)
}
