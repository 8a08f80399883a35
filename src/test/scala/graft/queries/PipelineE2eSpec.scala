package graft.queries

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** q118 composition invariants the row-hash oracle can't articulate:
  * the one-plan pipeline must agree with running its stages separately.
  */
class PipelineE2eSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** q25's filter, reimplemented independently for the cross-check. */
  private def kept = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for")
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), col("text"),
        size(col("toks")).as("n_tokens"),
        TextFns.punctRatio(col("text")).as("punct_ratio"),
        (TextFns.markerHits(col("toks"), stop).cast("double") /
          greatest(size(col("toks")), lit(1))).as("stop_ratio"))
      .filter(col("n_tokens").between(10, 5000)
        && col("punct_ratio") < 0.2 && col("stop_ratio") >= 0.02)
  }

  test("n_docs totals = distinct digests among quality survivors") {
    val e2e = TextQueries.q118PipelineE2e.run(spark, sfDir).cache()
    val nCanon = kept.select(md5(col("text"))).distinct().count()
    val total = e2e.agg(sum(col("n_docs"))).head.getLong(0)
    assert(total === nCanon)
    e2e.unpersist()
  }

  test("per-language totals match a separately-composed dedup stage") {
    val e2e = TextQueries.q118PipelineE2e.run(spark, sfDir)
    // independent composition: min-doc_id canonical row per digest via a
    // self-join instead of min_by, then the same rollup
    val k = kept.withColumn("dig", md5(col("text"))).cache()
    val winners = k.groupBy(col("dig")).agg(min(col("doc_id")).as("doc_id"))
    val canon = k.join(winners, Seq("dig", "doc_id"))
    val expected = canon.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"))
      .orderBy(col("lang"))
    assert(e2e.collect().toSeq === expected.collect().toSeq)
    k.unpersist()
  }

  /** q144's five stages, recomposed with DIFFERENT formulations where
    * one exists (window-rank exact dedup vs the query's agg+semi-join,
    * countDistinct overlap vs the query's distinct-then-count) — the
    * shard manifest must be identical row-for-row. */
  private def q144Recomposed = {
    import graft.functions.Sampling
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val exact = kept.select(col("doc_id"), col("text"), col("n_tokens"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val sh = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(TextFns.shinglePositions(col("t"), 3)).as("i"))
      .select(col("doc_id"), TextFns.shingleAt(col("t"), col("i"), 3).as("s"))
    val bench = sh.filter(col("doc_id") % 97 === 0).select(col("s")).distinct()
    val flagged = sh.filter(col("doc_id") % 97 =!= 0).join(bench, "s")
      .groupBy(col("doc_id")).agg(countDistinct(col("s")).as("n"))
      .filter(col("n") >= 3).select(col("doc_id"))
    val decon = exact.filter(col("doc_id") % 97 =!= 0)
      .join(flagged, Seq("doc_id"), "left_anti").cache()
    val pairs = Dedup.minhashLshPairs(decon, "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val fin = Dedup.dropNearDuplicates(decon, "doc_id", pairs)
    (pairs, fin,
      Sampling.assignShards(fin, col("doc_id"), 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("pos") * (col("doc_id") % 997)).as("ord_checksum"))
        .orderBy(col("shard")))
  }

  test("q144 prep pipeline ≡ independently recomposed stages") {
    val e2e = TextQueries.q144PrepPipeline.run(spark, sfDir)
    val (_, _, manifest) = q144Recomposed
    assert(e2e.collect().toSeq === manifest.collect().toSeq)
  }

  test("q144 keep-canonical: no surviving near-dup pair, canonical = component min") {
    val (pairs, fin, _) = q144Recomposed
    val ids = fin.select(col("doc_id"))
    val surviving = pairs
      .join(ids.select(col("doc_id").as("id_a")), "id_a")
      .join(ids.select(col("doc_id").as("id_b")), "id_b")
    assert(surviving.count() === 0)
    // every dropped doc is dominated by a smaller surviving id in its
    // component (keep-canonical semantics, not arbitrary deletion)
    val comp = graft.operators.Dedup.connectedComponents(pairs)
    val keepers = comp.groupBy(col("comp")).agg(min(col("node")).as("keep"))
    val wrong = comp.join(keepers, "comp")
      .join(ids, comp("node") === ids("doc_id"), "left_semi")
      .filter(col("node") =!= col("keep"))
    assert(wrong.count() === 0)
  }
}
