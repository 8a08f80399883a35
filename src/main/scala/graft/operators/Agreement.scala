package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement statistics — the labeling-QA layer of
  * training-data work: two raters (humans, model vs gold, or two
  * pipeline versions) label the same items; Cohen's kappa
  * (Cohen 1960) corrects their raw agreement for the agreement their
  * marginal label mixes would produce by chance.
  *
  * Exactness: per group everything is exact integers until ONE final
  * division — agree = Σ diag of the confusion matrix, pe_num =
  * Σ_k row_k·col_k over classes present in BOTH marginals, and
  * kappa = (agree·n − pe_num)/(n² − pe_num). The n² terms carry a
  * loud int64 guard at n > 3×10⁹ rows per group, folded into EVERY
  * output that computes an n² product (po, pe, kappa) so column
  * pruning can never drop it; a degenerate group whose chance
  * agreement is total (n² = pe_num, e.g. both raters constant) yields
  * NULL, identically in any engine.
  *
  * Scale: one item-grain scan into a (group × classes²) confusion
  * aggregate; the fold is confusion-grain. */
object Agreement {

  /** Per-`groupCol` Cohen's kappa between `raterA` and `raterB`.
    * @return (group, n_items, n_agree, po, pe, kappa) */
  def cohenKappa(items: DataFrame, groupCol: String, raterA: String,
      raterB: String): DataFrame = {
    val cm = items.groupBy(col(groupCol), col(raterA).as("ka"),
        col(raterB).as("kb"))
      .agg(count(lit(1)).as("n"))
    val per = cm.groupBy(col(groupCol))
      .agg(sum(col("n")).as("nd"),
        sum(when(col("ka") === col("kb"), col("n")).otherwise(0L)).as("agree"))
      .withColumn("ok", when(col("nd") > 3000000000L,
        raise_error(lit("cohen_kappa: per-group item count past the " +
          "int64 n^2 headroom — subsample or shard")).cast("long"))
        .otherwise(lit(1L)))
    val rm = cm.groupBy(col(groupCol), col("ka").as("k"))
      .agg(sum(col("n")).as("r"))
    val c2 = cm.groupBy(col(groupCol), col("kb").as("k"))
      .agg(sum(col("n")).as("c"))
    val marg = rm.join(c2, Seq(groupCol, "k"))
      .groupBy(col(groupCol))
      .agg(sum(col("r") * col("c")).as("pe_num"))
    val pe: Column = coalesce(col("pe_num"), lit(0L))
    per.join(marg, Seq(groupCol), "left")
      // `ok` (1, or raise_error past the n² headroom) is folded into
      // EVERY output that touches an n² term — po, pe, AND kappa — so
      // a caller selecting any single column still carries the guard
      // (pruning po alone used to drop it — r14 advice)
      .select(col(groupCol), col("nd").as("n_items"), col("agree").as("n_agree"),
        (round((col("agree") * col("ok")).cast("double") / col("nd"), 6)
          + lit(0.0d)).as("po"),
        (round((pe * col("ok")).cast("double") / (col("nd") * col("nd")), 6)
          + lit(0.0d)).as("pe"),
        // the noNegZero finisher sits OUTSIDE the CASE so the audit's
        // top-level contract holds; NULL + 0.0 stays NULL
        (when(col("nd") * col("ok") * col("nd") === pe, lit(null).cast("double"))
          .otherwise(round(
            (col("agree") * col("nd") - pe).cast("double")
              / (col("nd") * col("ok") * col("nd") - pe), 6)) + lit(0.0d)).as("kappa"))
      .orderBy(col(groupCol))
  }
}
