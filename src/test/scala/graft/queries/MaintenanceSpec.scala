package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Warehouse-maintenance invariants for q124 (upsert) and q125 (IVM). */
class MaintenanceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q124: merged cardinality = base + inserts; flag totals match the feed") {
    val base = graft.sources.Tables.customer(spark, sfDir).cache()
    val nBase = base.count()
    val nUpd = base.filter(col("c_custkey") % 2 === 1).count()
    val nIns = base.filter(col("c_custkey") % 10 === 0).count()
    val agg = RelationalQueries.q124UpsertMerge.run(spark, sfDir)
      .agg(sum(col("n_rows")), sum(col("n_updated")), sum(col("n_inserted"))).head
    assert(agg.getLong(0) === nBase + nIns)
    assert(agg.getLong(1) === nUpd)
    assert(agg.getLong(2) === nIns)
    base.unpersist()
  }

  test("q125: incremental partial-merge equals one-pass aggregation") {
    val direct = graft.sources.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_spend"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(20)
    val inc = RelationalQueries.q125IncrementalAgg.run(spark, sfDir)
    assert(inc.collect().toSeq === direct.collect().toSeq)
  }
}
