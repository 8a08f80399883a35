package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cumulative sums in value order — the house pattern
  * behind every exact rank/ECDF/quantile computation here (q90's
  * cutpoint ranks, q185's two-sample ECDF, q197's winsorized
  * boundaries).
  *
  * The naive form — `sum(c) OVER (PARTITION BY g ORDER BY v)` — plans
  * one task per group holding the group's ENTIRE value list: at 100 TB
  * a hot group serializes the job (and a global cumsum plans Exchange
  * SinglePartition outright). Instead: range-partition on
  * (group, value) so slice order IS global value order within each
  * group, run per-slice LOCAL window cumsums, and lift them to global
  * with a ≤ |groups|×slices-row offset table — the only global window
  * left runs over that bounded relation. Shuffled bytes track the
  * input grain (callers pass value-grain count tables, so distinct
  * values, not rows); no hint on the offset join — AQE broadcasts the
  * offset table by its measured size (house bounded-broadcast policy).
  */
object Ecdf {

  /** The conf-derived slice width for `slices = 0`. Some platforms
    * accept non-numeric settings for `spark.sql.shuffle.partitions`
    * (e.g. "auto" under externally-managed AQE) — fail with the remedy
    * rather than a bare NumberFormatException from inside the operator. */
  private[operators] def parseSliceWidth(conf: String): Int = {
    val parsed = conf.toIntOption.filter(_ > 0)
    require(parsed.nonEmpty,
      s"groupedCumsum: cannot derive the slice width from " +
        s"spark.sql.shuffle.partitions='$conf' (not a positive " +
        s"integer); pass an explicit slices > 0")
    parsed.get
  }

  /** Append, for each `sumCols` column c: `cum_<c>` — the per-group
    * running sum in ascending `orderCol` order (ties: whole tied run
    * collapses into whatever single input row carries it, so pass
    * value-GRAIN inputs where ties matter) — and `tot_<c>`, the
    * group's TOTAL, on every row. Totals ride the offset table (one
    * extra bounded window, zero extra shuffles) precisely so callers
    * never join a separate `groupBy(group).sum` aggregate: that extra
    * consumer of the input re-plans the whole upstream pipeline per
    * branch (constraint-derived IsNotNull filters make the subtrees
    * canonically different, so not even AQE stage reuse deduplicates
    * them — measured on q200: 5 scans of orders for 3 consumers).
    * Every input column passes through unchanged.
    *
    * With `withNext = true` the output also carries `next_<orderCol>` —
    * each row's successor value in the group's ascending order (NULL on
    * the group's maximum), the ingredient that turns a cumsum into an
    * INTEGRAL: Σ F(v)·(next−v) is a Riemann sum over the ECDF, so
    * Wasserstein-1 / Cramér-style statistics fall out of the same one
    * range exchange. Distributed the same way as the cumsum: a lead
    * inside each slice, with the slice-boundary successor coming from
    * the NEXT non-empty slice's minimum, which rides the offset table
    * as one more bounded window (a group's slices are contiguous in
    * __pid order, so lead over the offset rows IS the next non-empty
    * slice). Requires value-grain input where duplicates exist (same
    * contract as ties above).
    *
    * @param partCols group columns (empty = one global cumsum)
    * @param slices   range-partition width; 0 (the default) derives it
    *                 from `spark.sql.shuffle.partitions` at PLAN time,
    *                 so the cumsum stage's parallelism scales with the
    *                 cluster like every other exchange instead of
    *                 sitting at a compiled-in constant (a 1000-executor
    *                 job would otherwise funnel billions of distinct
    *                 values through 32 range partitions while the rest
    *                 of the plan fans out). The offset table stays
    *                 bounded at |groups|×slices rows either way — at
    *                 any realistic shuffle-partition setting that is
    *                 still dimension-sized. Pass an explicit positive
    *                 width only to pin plans in tests.
    * @param withNext also emit `next_<orderCol>` (successor value)
    */
  def groupedCumsum(df: DataFrame, partCols: Seq[String], orderCol: String,
      sumCols: Seq[String], slices: Int = 0,
      withNext: Boolean = false): DataFrame = {
    require(sumCols.nonEmpty, "no columns to accumulate")
    require(slices >= 0, s"negative slice count: $slices")
    val width =
      if (slices > 0) slices
      else parseSliceWidth(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    val gcols = partCols.map(col)
    val parted = df
      .repartitionByRange(width, (gcols :+ col(orderCol)): _*)
      .withColumn("__pid", spark_partition_id())
    val byGroup = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val byGroupRows = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
    val wholeGroup = Window.partitionBy(gcols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = parted
      .groupBy((gcols :+ col("__pid")): _*)
      .agg(sum(col(sumCols.head)).as(s"__s0"),
        sumCols.tail.zipWithIndex.map { case (c, i) =>
          sum(col(c)).as(s"__s${i + 1}") }
          :+ min(col(orderCol)).as("__mn"): _*)
      .select((gcols :+ col("__pid"))
        ++ sumCols.indices.map(i =>
          coalesce(sum(col(s"__s$i")).over(byGroup), lit(0L)).as(s"__off$i"))
        ++ sumCols.indices.map(i =>
          sum(col(s"__s$i")).over(wholeGroup).as(s"__tot$i"))
        ++ (if (withNext) Seq(lead(col("__mn"), 1).over(byGroupRows)
              .as("__nextmn"))
            else Nil): _*)
    val slice = Window.partitionBy((gcols :+ col("__pid")): _*)
      .orderBy(col(orderCol))
    parted
      .join(offs, partCols :+ "__pid")
      .select(df.columns.map(col)
        ++ sumCols.zipWithIndex.map { case (c, i) =>
          (sum(col(c)).over(slice) + col(s"__off$i")).as(s"cum_$c") }
        ++ sumCols.zipWithIndex.map { case (c, i) =>
          col(s"__tot$i").as(s"tot_$c") }
        ++ (if (withNext) Seq(coalesce(lead(col(orderCol), 1).over(slice),
              col("__nextmn")).as(s"next_$orderCol"))
            else Nil): _*)
  }
}
