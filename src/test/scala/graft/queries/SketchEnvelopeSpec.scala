package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Error-envelope gates for the four rows-only sketch queries
  * (q30/q38/q58/q105). Rows-only is the right DRIVER contract for
  * approximate sketches (register layouts have no DuckDB twin), but it
  * would also let a silently broken sketch ride the exemption — these
  * tests pin each sketch's mathematical guarantee against an exact twin
  * computed over the same gate data, at BOTH gate SFs (r12 verdict #4).
  */
class SketchEnvelopeSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("q38: approx_count_distinct inside the HLL++ envelope vs exact, both SFs") {
    // requested rsd = 0.02; gate at 5× the rsd — loose enough to never
    // flake on a correct sketch, tight enough that an off-by-10× bug
    // (wrong column, dropped merge) cannot pass
    for (dir <- sfs) {
      val approx = RelationalQueries.q38ApproxDistinct.run(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val exact = Tables.lineitem(spark, dir).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("p"),
          countDistinct(col("l_suppkey")).as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(approx.keySet === exact.keySet, dir)
      exact.foreach { case (k, (p, s)) =>
        val (ap, asup) = approx(k)
        assert(math.abs(ap - p).toDouble / p <= 0.10, s"$dir $k parts: $ap vs $p")
        assert(math.abs(asup - s).toDouble / s <= 0.10, s"$dir $k supps: $asup vs $s")
      }
    }
  }

  test("q105: HLL rollup estimates inside the lgK=12 envelope vs exact, both SFs") {
    // lgK=12 → rse ≈ 1.04/√4096 ≈ 1.6%; gate at 10% (≈ 6σ). The rollup
    // union must not lose registers: the estimate is compared against
    // the EXACT weekly distinct from the raw events, the number the
    // union-of-daily-sketches pattern exists to approximate.
    for (dir <- sfs) {
      val est = EventQueries.q105HllRollup.run(spark, dir).collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) ->
          r.getAs[Number](2).doubleValue()).toMap
      val exact = Tables.events(spark, dir)
        .groupBy(col("event_type"),
          date_trunc("week", date_trunc("day", col("ts"))).as("week"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
      assert(est.keySet === exact.keySet, dir)
      exact.foreach { case (k, n) =>
        val e = est(k)
        assert(math.abs(e - n) / n <= 0.10, s"$dir $k: est=$e exact=$n")
      }
    }
  }

  test("q58: Misra-Gries survivors under-estimate by at most N/k, both SFs") {
    // the MG guarantee (merge-compatible): for every reported token,
    // 0 < est ≤ true_count and true_count − est ≤ N/k (N = the group's
    // token count, k = 32 counters) — an over-counting or
    // token-mangling bug breaks est ≤ true; a merge that drops counts
    // past the decrement budget breaks the N/k bound
    for (dir <- sfs) {
      val reported = TextQueries.q58HeavyHitters.run(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val toks = Tables.documents(spark, dir)
        .select(col("lang"), explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      val trueCounts = toks.groupBy(col("lang"), col("t")).count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val nPerLang = toks.groupBy(col("lang")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(reported.nonEmpty, dir)
      reported.foreach { case ((lang, tok), est) =>
        val truth = trueCounts.getOrElse((lang, tok),
          fail(s"$dir: reported token ($lang, $tok) does not exist in the corpus"))
        assert(est > 0 && est <= truth, s"$dir ($lang,$tok): est=$est true=$truth")
        assert(truth - est <= nPerLang(lang) / 32.0,
          s"$dir ($lang,$tok): undercount ${truth - est} > N/k=${nPerLang(lang) / 32.0}")
      }
    }
  }

  test("q30: banded SimHash pair set EQUALS the brute-force hamming≤3 set, both SFs") {
    // pigeonhole completeness: 3 bit errors corrupt at most 3 of the 4
    // 16-bit bands, so every hamming≤3 signature pair shares an exact
    // band — the blocked candidate set must find EVERY such pair, and
    // the verify step must report the exact hamming. A banding bug
    // (wrong shift, dropped band) silently loses pairs; this catches it.
    import graft.functions.TextFns
    for (dir <- sfs) {
      val got = TextQueries.q30SimhashPairs.run(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue()).toMap
      val sigs = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id"),
          TextFns.simhash64(TextFns.tokens(col("text"))).as("sig"))
      val brute = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          TextFns.hamming64(col("a.sig"), col("b.sig")).as("h"))
        .filter(col("h") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue()).toMap
      assert(got === brute, s"$dir: banded=${got.size} brute=${brute.size}")
    }
  }
}
