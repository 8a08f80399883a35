package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-sample distribution-drift statistics from ONE cumsum pass.
  *
  * The monitoring read a 100 TB pipeline actually issues is "compare
  * today's distribution to the reference on every statistic we alarm
  * on" — and every ECDF statistic (KS max-gap, Wasserstein-1 transport,
  * Cramér–von Mises, and friends) is a different reduction of the SAME
  * two cumulative count tables. Computing them in separate queries
  * (q185's KS, q203's W1) re-pays the fact-scale shuffle per statistic;
  * this operator pays it once: one value-grain histogram in, one
  * `Ecdf.groupedCumsum` (range exchange + bounded offset windows,
  * `withNext` supplying the Riemann gaps), one group-grain reduction
  * out. The three statistics alarm on different drift SHAPES: KS the
  * worst single gap, W1 the mass×distance transport, CvM the gap
  * averaged over the pooled sample (sensitive to many small gaps KS
  * ignores).
  *
  * Exactness contract (the q185/q203 discipline): inputs are integer
  * counts on an integer value grid; the KS numerator max|a·n2 − b·n1|,
  * the W1 sum Σ|a·n2 − b·n1|·gap, and the CvM sum Σ(cA+cB)·(a·n2−b·n1)²
  * run in decimal(38,0), and the only float operations are the final
  * divisions. Headroom note: the CvM numerator needs (n1·n2)²·N digits
  * — decimal(38,0)/int128 covers groups to ~1e9 rows per side; past
  * that, coarsen the value grid (the statistic is grid-invariant up to
  * the grid's own resolution).
  */
object Drift {

  /** Per-group exact KS D and W1 between the two count columns of a
    * value-grain histogram.
    *
    * @param hist  one row per (partCols, v) with nonnegative integer
    *              counts `cA`, `cB` (value grain — the Ecdf tie contract)
    * @return partCols ++ (n1, n2, dnum, wsum, csum) — the sample sizes
    *         and the three EXACT decimal(38,0) numerators (KS max, W1
    *         Riemann sum, CvM pooled sum of squares), for callers that
    *         finish with their own units/rounding (q203's dollars)
    */
  def reductions(hist: DataFrame, partCols: Seq[String], v: String,
      cA: String, cB: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cum = Ecdf.groupedCumsum(hist, partCols, v, Seq(cA, cB),
      withNext = true)
    // |F_A − F_B| scaled by n1·n2, exact: the KS numerator per value,
    // the W1 integrand once multiplied by the gap to the next value,
    // and the CvM summand once squared and pooled-weighted
    val dev = abs(col(s"cum_$cA").cast(dec) * col(s"tot_$cB")
      - col(s"cum_$cB").cast(dec) * col(s"tot_$cA"))
    cum
      .groupBy((partCols.map(col)
        :+ col(s"tot_$cA") :+ col(s"tot_$cB")): _*)
      .agg(max(dev).as("dnum"),
        // the group's maximum value has no successor and contributes
        // nothing to the integral (both ECDFs have reached 1 there)
        sum(when(col(s"next_$v").isNotNull,
          dev * (col(s"next_$v") - col(v)))
          .otherwise(lit(0).cast(dec))).as("wsum"),
        // CvM sums over POOLED OBSERVATIONS: each distinct value
        // carries its pooled multiplicity cA + cB
        sum((col(cA) + col(cB)).cast(dec) * dev * dev).as("csum"))
      .select((partCols.map(col)
        :+ col(s"tot_$cA").as("n1") :+ col(s"tot_$cB").as("n2")
        :+ col("dnum") :+ col("wsum") :+ col("csum")): _*)
  }

  /** [[reductions]] finished at 6 dp: partCols ++ (n1, n2, ks_d, w1,
    * cvm) — ks_d ∈ [0,1], w1 in VALUE UNITS (callers rescale, e.g.
    * cents → dollars), cvm the two-sample Cramér–von Mises criterion
    * n1·n2/N² · Σ_pooled (F_A−F_B)². A group with an EMPTY side has no
    * drift comparison — all three emit NULL (not the 0/0 NaN a bare
    * division would give), and oracle twins must mirror the guard
    * (`CASE WHEN n1 > 0 AND n2 > 0 THEN … END`). */
  def ksAndW1(hist: DataFrame, partCols: Seq[String], v: String,
      cA: String, cB: String): DataFrame = {
    val r = reductions(hist, partCols, v, cA, cB)
    val ok = col("n1") > 0 && col("n2") > 0
    val nn = col("n1").cast("double") * col("n2")
    val bigN = (col("n1") + col("n2")).cast("double")
    r.select((partCols.map(col) :+ col("n1") :+ col("n2")
      :+ when(ok, round(col("dnum").cast("double") / nn, 6)).as("ks_d")
      :+ when(ok, round(col("wsum").cast("double") / nn, 6)).as("w1")
      // T = n1·n2/N² · Σ_pooled (F_A−F_B)², and dev = (F_A−F_B)·n1·n2,
      // so T = csum / (n1·n2·N²)
      :+ when(ok, round(col("csum").cast("double")
          / (nn * bigN * bigN), 6)).as("cvm")): _*)
  }
}
