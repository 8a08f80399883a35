package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — "best score at every cost level":
  * the data-selection primitive for picking training documents that
  * maximize quality per token, configs that maximize accuracy per
  * dollar, etc. A row (cost t, score s) is dominated iff some row has
  * strictly lower cost and ≥ score, or equal cost and > score; the
  * frontier is every undominated row.
  *
  * The textbook formulation is a running max over the GLOBAL cost
  * order — a single-partition window this engine refuses (one task
  * would sort the corpus). Instead the scan decomposes by the same
  * two-level trick the engine's other global-order ops use:
  *
  *  1. collapse to COST grain: max score per distinct cost (one
  *     partial-agg shuffle — the frontier test only needs per-cost
  *     maxima);
  *  2. fixed-width-bucket the cost axis over a broadcast 1-row
  *     min/max (the q155 binning idiom, B buckets);
  *  3. per-bucket maxima (≤B rows) get their strict-prefix max with a
  *     window over the BOUNDED bucket table — B is a constant, so the
  *     one single-partition window touches ≤B rows by construction;
  *  4. within each bucket, a bucket-partitioned RANGE window computes
  *     the running max over strictly-smaller costs;
  *  5. prefix(bucket) ⊔ within-bucket max = the global
  *     max-over-smaller-costs, joined back to row grain.
  *
  * Scores must arrive as integers (grid-quantized upstream, the
  * engine-wide idiom) so max/compare are exact.
  */
object Pareto {

  /** Rows of `df` on the (minimize `tCol`, maximize `sCol`) frontier.
    * `tCol` must be integral, `sCol` an integral (grid) score; ties on
    * (t, s) all stay on the frontier. */
  def frontier2d(df: DataFrame, tCol: String, sCol: String,
      buckets: Int = 32): DataFrame = {
    val pts = df.withColumn("t", col(tCol).cast("long"))
      .withColumn("s", col(sCol).cast("long"))
    // 1. cost grain
    val meq = pts.groupBy(col("t")).agg(max(col("s")).as("m_eq"))
    // 2. bucket the cost axis (exact while range·B < 2^53)
    val bounds = pts.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
    val bucketed = meq.crossJoin(broadcast(bounds))
      .withColumn("bkt", floor((col("t") - col("tmin")) * buckets /
        (col("tmax") - col("tmin") + 1)))
    // 3. strict-prefix max across buckets: ≤B rows by construction
    val prefix = bucketed.groupBy(col("bkt")).agg(max(col("m_eq")).as("bmax"))
      .withColumn("p_lt", max(col("bmax")).over(
        Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bkt"), col("p_lt"))
    // 4. within-bucket running max over strictly smaller costs
    val withinW = Window.partitionBy(col("bkt")).orderBy(col("t"))
      .rangeBetween(Window.unboundedPreceding, -1)
    // no broadcast HINT: prefix is ≤B rows by construction, but the
    // registry-wide audit only trusts hints on provably-bounded
    // subtrees — AQE broadcasts a 32-row side by size stats anyway
    val mlt = bucketed.join(prefix, "bkt")
      .withColumn("w_lt", max(col("m_eq")).over(withinW))
      // greatest() skips nulls; both null ⇒ no smaller cost exists
      .select(col("t"), col("m_eq"), greatest(col("p_lt"), col("w_lt")).as("m_lt"))
    // 5. frontier test at row grain
    pts.join(mlt, "t")
      .filter(col("s") === col("m_eq") &&
        (col("m_lt").isNull || col("s") > col("m_lt")))
      .drop("t", "s", "m_eq", "m_lt")
  }
}
