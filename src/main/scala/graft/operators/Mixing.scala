package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixing allocation (the DoReMi/Pile recipe endpoint): split a
  * token budget across sources under availability caps.
  *
  * Water-filling with uniform target weights: alloc_s = min(avail_s, λ)
  * with λ chosen so Σ alloc = B. The classical sort-based closed form
  * runs relationally over the SOURCE-grain relation (all fact-scale
  * work is the caller's per-source count): ascending-availability sort,
  * per-row tentative λᵢ = (B − cum_below)/remaining, saturation is
  * prefix-monotone along the sort so per-row flags compose into the
  * global λ* without iteration. λ* is carried as INTEGER
  * numerator/denominator and the final allocation is an integer `div` —
  * no float ever divides the budget, so engines can't round a boundary
  * differently (q195's oracle replays this arithmetic verbatim).
  *
  * The input is one (source, avail) row per source — a streaming caller
  * maintains it as |sources|-row grouped state (bounded forever) and
  * folds the allocation on the serving read, the same
  * read-side-derivation contract as `StreamOps.abSufficientStats`.
  */
object Mixing {

  /** @param avail     one row per source: (`source`, `avail`) with
    *                  integral `avail`
    * @param budgetNum budget = avail_total · budgetNum / budgetDen
    * @param budgetDen see budgetNum; integer ratio keeps the budget an
    *                  exact integer in both engines
    * @return (source, avail, alloc, epochs, saturated) — epochs ≤ 1 by
    *         construction (no source is oversampled) */
  def waterfill(avail: DataFrame, budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && budgetNum <= budgetDen,
      "budget must be a fraction of total availability")
    val tot = avail.agg(sum(col("avail")).as("t"), count(lit(1)).as("ns"))
    val bySz = Window.orderBy(col("avail"), col("source"))
    val r = avail
      .withColumn("rk", row_number().over(bySz).cast("long"))
      .withColumn("cumb", coalesce(sum(col("avail")).over(
        bySz.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val f = r.crossJoin(broadcast(tot)) // 1-row bounded
      .select(col("source"), col("avail"), col("rk"), col("cumb"),
        expr(s"(t * $budgetNum) div $budgetDen").as("b"), col("ns"))
      .withColumn("saturated",
        when(col("avail") * (col("ns") - col("rk") + 1) <= col("b") - col("cumb"),
          1L).otherwise(0L))
    // the no-PARTITION windows run over the |sources|-row relation —
    // dimension-grain by construction, same class as q188's calendar
    // windows
    val overAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    f.withColumn("sat_a",
        sum(when(col("saturated") === 1, col("avail")).otherwise(0L)).over(overAll))
      .withColumn("unsat_n", sum(lit(1L) - col("saturated")).over(overAll))
      .withColumn("alloc", when(col("saturated") === 1, col("avail"))
        .otherwise(expr("(b - sat_a) div unsat_n")))
      .select(col("source"), col("avail"), col("alloc"),
        // a zero-availability source allocates 0 of 0 — report 0
        // epochs, not 0/0 = NaN (an empty source row can reach the
        // operator from an outer-join availability table)
        when(col("avail") === 0, lit(0.0))
          .otherwise(round(col("alloc").cast("double") / col("avail"), 4))
          .as("epochs"),
        col("saturated").cast("int").as("saturated"))
  }
}
