package graft.queries

import org.apache.spark.sql.functions._

/** The near-dup CORPUS EPOCH contract (r15, closing the r14 verdict's
  * one carried weak flag): the static band unroll is DERIVED from the
  * schedule (NdMaxBands = bandsForBits(NdGuaranteedBits)), so the
  * analytic OR-of-ANDs candidate recall at the design similarity holds
  * the R* target at EVERY resolvable bit width — no slack-cap
  * carve-out anywhere (the r14 spec's "at the cap the schedule clips
  * recall" branch is gone). Corpora past the epoch boundary fail
  * LOUDLY in both dialects instead of silently degrading. Pure driver
  * math plus one runtime drill of the loud path: the schedule
  * constants are computed once in Scala and embedded in both dialects,
  * so this spec pins the table itself. */
class BandScheduleSpec extends graft.SparkSpec {

  private val simTarget = 0.89
  private val recallTarget = 0.95
  private def p1 = 1.0 - math.acos(simTarget) / math.Pi

  /** Independent derivation: the smallest L with analytic recall ≥ R*,
    * found by direct search instead of the closed-form log ratio. */
  private def smallestL(bits: Int): Int = {
    val pBand = math.pow(p1, bits)
    (1 to 1000).find(l => 1.0 - math.pow(1.0 - pBand, l) >= recallTarget)
      .getOrElse(sys.error(s"no L under 1000 reaches R* at bits=$bits"))
  }

  test("bandsForBits matches an independent smallest-L search at every resolvable width") {
    (4 to VectorQueries.NdGuaranteedBits).foreach { bits =>
      assert(VectorQueries.bandsForBits(bits) === smallestL(bits),
        s"bits=$bits")
    }
  }

  test("schedule is monotone in bits and hits known anchor points") {
    val table = (4 to VectorQueries.NdGuaranteedBits)
      .map(VectorQueries.bandsForBits)
    assert(table === table.sorted, "band count must not shrink as bits grow")
    // the anchors the round-14 probes exercised: sf0.01 (n=500 → bits 5),
    // sf0.1 (n=2000 → bits 7), ×8 (16k → bits 10), ×32 (64k → bits 12) —
    // all UNCHANGED by the r15 epoch lift (the old clamp never bound
    // below bits 14), so gate hashes carry over; plus the widths the old
    // 24-band cap used to clip (14 → 28, 20 → 78)
    assert(VectorQueries.bandsForBits(5) === 6)
    assert(VectorQueries.bandsForBits(7) === 8)
    assert(VectorQueries.bandsForBits(10) === 14)
    assert(VectorQueries.bandsForBits(12) === 20)
    assert(VectorQueries.bandsForBits(14) === 28)
    assert(VectorQueries.bandsForBits(VectorQueries.NdGuaranteedBits) === 78)
  }

  test("static width is DERIVED from the epoch and recall holds with NO carve-out") {
    assert(VectorQueries.NdMaxBands ===
      VectorQueries.bandsForBits(VectorQueries.NdGuaranteedBits),
      "NdMaxBands must be the schedule's own requirement at the epoch edge")
    (4 to VectorQueries.NdGuaranteedBits).foreach { bits =>
      val l = VectorQueries.bandsForBits(bits)
      assert(l <= VectorQueries.NdMaxBands,
        s"bits=$bits needs $l bands > static width ${VectorQueries.NdMaxBands}")
      val recall = 1.0 - math.pow(1.0 - math.pow(p1, bits), l)
      assert(recall >= recallTarget, s"bits=$bits bands=$l recall=$recall")
    }
  }

  test("epoch table: every corpus size through >= 10^7 resolves inside the guarantee") {
    val boundary = VectorQueries.NdTarget.toLong << VectorQueries.NdGuaranteedBits
    assert(boundary >= 10000000L,
      s"epoch boundary $boundary does not cover the 10^7-vector requirement")
    // the exact-integer resolution chain: corpus n resolves to the
    // smallest bits with n <= NdTarget * 2^bits; every n inside the
    // epoch lands on a bits whose full band requirement the static
    // width carries (checked above), so recall >= R* end to end
    def resolve(n: Long): Int =
      (VectorQueries.NdMinBits to VectorQueries.NdGuaranteedBits)
        .find(b => n <= (VectorQueries.NdTarget.toLong << b))
        .getOrElse(sys.error(s"n=$n outside the epoch"))
    // probe the table at each band boundary and at the 10^7 anchor
    (VectorQueries.NdMinBits until VectorQueries.NdGuaranteedBits).foreach { b =>
      val hi = VectorQueries.NdTarget.toLong << b
      assert(resolve(hi) === b, s"upper edge of bits=$b")
      assert(resolve(hi + 1) === b + 1, s"lower edge of bits=${b + 1}")
    }
    assert(resolve(10000000L) === VectorQueries.NdGuaranteedBits)
    assert(resolve(boundary) === VectorQueries.NdGuaranteedBits)
  }

  test("past the epoch boundary the screen fails LOUDLY, not silently") {
    import spark.implicits._
    val boundary = VectorQueries.NdTarget.toLong << VectorQueries.NdGuaranteedBits
    // inside the epoch: resolves normally
    val ok = Seq(boundary).toDF("n")
      .select(VectorQueries.ndBitsCol(col("n")).as("bits")).head().getInt(0)
    assert(ok === VectorQueries.NdGuaranteedBits)
    // one past it: raise_error fires (the guard is folded into the
    // value, so selecting bits alone cannot prune it)
    val e = intercept[Exception] {
      Seq(boundary + 1).toDF("n")
        .select(VectorQueries.ndBitsCol(col("n")).as("bits")).head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("R*-guaranteed epoch")),
      s"wrong failure: ${e.getMessage}")
  }
}
