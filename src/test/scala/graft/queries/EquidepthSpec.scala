package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q90's range-partitioned exact-rank quantiles must agree with Spark's
  * own `percentile` aggregate (the formulation it replaced) — on every
  * scale factor, not just the oracle-gated ones.
  */
class EquidepthSpec extends SparkSpec {

  test("rank-method deciles ≡ percentile-aggregate deciles") {
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val li = graft.sources.Tables.lineitem(spark, sfDir)
      val expected = li.agg(percentile(col("l_extendedprice"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cs"))
        .head.getSeq[Double](0)
      // recover the cutpoints the query actually used from its bins:
      // every bin boundary must match — equality of the per-bin result
      // row set implies equality of cuts up to tie-safety, so compare
      // the full q90 output against one built from `expected`
      val viaQuery = q90rows(sfDir)
      val viaAgg = li.select(col("l_extendedprice").as("v"),
          expected.indices.map(i =>
            when(col("l_extendedprice") > lit(expected(i)), 1).otherwise(0))
            .reduce(_ + _).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_rows"),
          round(min(col("v")), 2).as("lo"), round(max(col("v")), 2).as("hi"),
          round(sum(col("v")), 2).as("mass"))
        .orderBy(col("bin"))
        .collect().toSeq
      assert(viaQuery === viaAgg, s"divergence at $sfDir")
    }
  }

  private def q90rows(sfDir: String) =
    RelationalQueries.q90EquidepthBins.run(spark, sfDir).collect().toSeq
}
