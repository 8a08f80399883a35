package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter-accelerated semi-join: the explicit form of the runtime
  * row filter (Spark's `spark.sql.optimizer.runtimeFilter.bloomFilter` /
  * "sideways information passing" in the literature). The dim side's
  * keys are folded into ONE bloom filter; the fact side drops
  * non-candidate rows BEFORE its shuffle, which is the whole point at
  * 100 TB — the exchange moves only rows that can possibly match, and
  * false positives are removed by the real semi-join, so the RESULT is
  * exact regardless of the filter's error rate.
  *
  * Built on the same Catalyst trio the optimizer's InjectRuntimeFilter
  * rule uses: `BloomFilterAggregate` over xxhash64 on the build side,
  * carried to the probe side as a `ScalarSubquery` (might_contain
  * requires a constant/subquery bloom, and the subquery keeps the build
  * lazy — no driver-side collect), probed by `BloomFilterMightContain`.
  * Codegen'd end to end, no UDF.
  */
object BloomJoin {

  /** The dim side's keys as a 1-row bloom-filter blob, usable as a
    * filter operand (scalar subquery). */
  def bloomOf(dim: DataFrame, dimKey: String,
      expectedItems: Long, numBits: Long): Column = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col(dimKey)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val plan = dim.agg(ColumnBridge.column(agg).as("__bf")).queryExecution.analyzed
    ColumnBridge.column(ScalarSubquery(plan))
  }

  /** Probe: false → definitely absent; true → candidate. Null on null key. */
  def mightContain(bloom: Column, key: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        ColumnBridge.expression(bloom),
        new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Exact left-semi join of `fact` to `dim`, bloom-prefiltered.
    *
    * @param expectedItems sizing hint for the filter (distinct dim keys)
    * @param numBits       filter width; ~10 bits/item ≈ 1% FP rate
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 200000L, numBits: Long = 2000000L): DataFrame =
    fact
      .filter(mightContain(bloomOf(dim, dimKey, expectedItems, numBits), col(factKey)))
      .join(dim, fact(factKey) === dim(dimKey), "left_semi")
}
