package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity release auditing (the q215 family) as a
  * shared two-stage fold, so the batch audit and the streaming
  * standing monitor run the SAME code and cannot drift (the house
  * monthValueCounts/trajectoryGrid discipline).
  *
  * Stage 1 — [[classState]]: (quasi-identifier × sensitive)-grain
  * counts. This is the grain that makes l-diversity INCREMENTAL: a
  * streaming `count(DISTINCT sensitive)` per class would need distinct
  * state per group, but at (QI, sensitive) grain the distinct count is
  * just the number of state rows in the class — a plain additive count
  * state, complete-mode streamable, bounded by the QI × sensitive
  * value domain (dimension-grain, not row-grain).
  *
  * Stage 2 — [[audit]]: the per-report-group rollup (class count,
  * k_min, suppression cost of enforcing k, l-diversity floor). All
  * BIGINT counts; the two ratios are single final divisions of exact
  * sums (the q215 exactness contract).
  */
object Privacy {

  /** (QI..., sensitive)-grain class state: one hash aggregate, additive
    * under union — the same call works on a batch DataFrame and on a
    * complete-mode stream. */
  def classState(rows: DataFrame, qiCols: Seq[String],
      sensCol: String): DataFrame = {
    // the count column's name is part of the state contract (audit()
    // canonicalizes by grouping on every OTHER column) — a QI or
    // sensitive column named "c" would silently drop out of the grain
    // and corrupt the l-diversity floor, so refuse it loudly
    require(!(qiCols :+ sensCol).contains("c"),
      "Privacy: 'c' is reserved for the class-state count column — " +
        "rename the conflicting QI/sensitive column before auditing")
    rows
      .groupBy((qiCols :+ sensCol).map(col): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** The release audit over [[classState]] output: per `reportCol`
    * (one of the QI columns) — row/class counts, the smallest class
    * (k of k-anonymity), the suppression cost of enforcing `k`, and
    * the l-diversity floor. Matches the registered q215 semantics. */
  def audit(state: DataFrame, qiCols: Seq[String], reportCol: String,
      k: Int = 5): DataFrame = {
    require(qiCols.contains(reportCol),
      s"audit: reportCol '$reportCol' must be one of the QI columns $qiCols")
    require(!qiCols.contains("c"),
      "Privacy: 'c' is reserved for the class-state count column — " +
        "rename the conflicting QI column before auditing")
    // [[classState]] is additive under union, so a caller may pass a
    // UNION of ingest deltas — canonicalize to one row per
    // (QI, sensitive) first, or l_div (= state-row count per class)
    // would count duplicates and OVER-report the l-diversity floor (a
    // release gate passing a table that actually leaks)
    val canon = state
      .groupBy(state.columns.filterNot(_ == "c").map(col): _*)
      .agg(sum(col("c")).as("c"))
    val cls = canon
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("c")).as("sz"), count(lit(1)).as("l_div"))
    cls.groupBy(col(reportCol))
      .agg(sum(col("sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("sz")).as("k_min"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("classes_below_k"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("rows_suppressed"),
        round(sum(when(col("sz") < k, col("sz")).otherwise(0L)).cast("double")
          / sum(col("sz")), 6).as("pct_suppressed"),
        min(col("l_div")).as("min_l_diversity"),
        round(sum(col("l_div")).cast("double") / count(lit(1)), 6)
          .as("avg_l_diversity"))
      .orderBy(col(reportCol))
  }
}
