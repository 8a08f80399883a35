package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q117 invariant the oracle can't see: because split assignment is
  * keyed by the near-dup component id, no near-dup pair may straddle a
  * split boundary (train/test leakage), and every component's members
  * share one split. */
class LeakageSafeSplitSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every document gets exactly one split and totals add up") {
    val s = VectorQueries.leakageSafeSplits(spark, sfDir).cache()
    val n = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(s.count() === n)
    assert(s.filter(col("split").isNull).count() === 0)
    assert(s.select(col("vec_id")).distinct().count() === n)
    s.unpersist()
  }

  test("no near-dup pair straddles a split boundary") {
    val s = VectorQueries.leakageSafeSplits(spark, sfDir)
    val pairs = VectorQueries.nearDupPairs(spark, sfDir)
      .select(col("id_a"), col("id_b"))
    val straddling = pairs
      .join(s.select(col("vec_id").as("id_a"), col("split").as("split_a")), "id_a")
      .join(s.select(col("vec_id").as("id_b"), col("split").as("split_b")), "id_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(straddling.count() === 0)
  }

  test("all members of a component share one split") {
    val s = VectorQueries.leakageSafeSplits(spark, sfDir)
    val multi = s.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("nsplits"))
      .filter(col("nsplits") > 1)
    assert(multi.count() === 0)
  }
}
