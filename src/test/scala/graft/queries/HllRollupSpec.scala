package graft.queries

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** q105 has no DuckDB twin (DataSketches registers), so its guarantees
  * are pinned here instead: the union-of-parts sketch is IDENTICAL to
  * the whole-input sketch (register max is associative), and estimates
  * stay within HLL's error envelope of the exact distinct counts. */
class HllRollupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("union of daily sketches estimates exactly like one weekly sketch") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        date_trunc("week", col("ts")).as("week"), col("user_id"))
    val viaRollup = ev.groupBy(col("event_type"), col("day"), col("week"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy(col("event_type"), col("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est"))
    val direct = ev.groupBy(col("event_type"), col("week"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
    val a = viaRollup.orderBy("event_type", "week").collect().map(_.toString).toSeq
    val b = direct.orderBy("event_type", "week").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("weekly estimates are within the lgK=12 error envelope of exact") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), date_trunc("week", col("ts")).as("week"), col("user_id"))
    val est = ev.groupBy(col("event_type"), col("week"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
    val exact = ev.groupBy(col("event_type"), col("week"))
      .agg(countDistinct(col("user_id")).as("n"))
    val joined = est.join(exact, Seq("event_type", "week")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, n) = (r.getLong(2).toDouble, r.getLong(3).toDouble)
      // 3σ at lgK=12 is ~2.4%; allow 5% for small-cardinality bias
      assert(math.abs(e - n) <= math.max(2.0, 0.05 * n),
        s"${r.getString(0)} ${r.get(1)}: est $e vs exact $n")
    }
  }
}
