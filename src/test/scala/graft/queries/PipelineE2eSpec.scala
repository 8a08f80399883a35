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
}
