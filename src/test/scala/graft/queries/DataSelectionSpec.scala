package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the data-selection trio (q119/q120/q121) that
  * the row-hash oracle can't articulate.
  */
class DataSelectionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q119: target-language docs outscore the rest on average") {
    // DSIR with target lang='en' must assign higher mean importance to
    // en docs than to the others — that's the entire point of the op
    val w = TextQueries.q119DsirWeights.run(spark, sfDir)
      .groupBy(col("lang") === "en")
      .agg(avg(col("log_weight")).as("mw"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // top-20 should be en-dominated; if any non-en snuck in, it must
    // still score below the en mean
    assert(w.contains(true) && w(true)._2 > 0)
    w.get(false).foreach { case (mw, _) => assert(mw < w(true)._1) }
  }

  test("q120: coverage is monotone nondecreasing and bounded by 1") {
    val rows = TextQueries.q120VocabCoverage.run(spark, sfDir)
      .orderBy(col("vocab_size")).collect()
    assert(rows.nonEmpty)
    val covs = rows.map(_.getAs[Double]("coverage"))
    covs.foreach(c => assert(c > 0.0 && c <= 1.0))
    covs.sliding(2).foreach { case Array(a, b) => assert(b >= a); case _ => }
  }

  test("q121: KL divergence is nonnegative for every source") {
    val rows = TextQueries.q121SourceDivergence.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("kl") >= 0.0)
      assert(r.getLong(r.fieldIndex("n_tokens")) > 0)
    }
  }
}
