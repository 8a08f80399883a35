package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the audit face of the CDC/versioning surface (q124
  * writes versions, q125 maintains aggregates over them; this answers
  * "what actually changed between two versions?"). A corpus pipeline
  * runs it between ingest snapshots to catch silent regressions: a
  * collapsed source, a column gone all-null, an unexpected mass update.
  *
  * Scale shape: ONE full-outer key join (the two snapshots shuffle by
  * the key, or AQE broadcasts a small delta side) and a narrow
  * per-row status expression — no window, no second pass. Per-column
  * comparison uses null-safe equality (`<=>`), so a null→value or
  * value→null transition counts as a change rather than vanishing.
  */
object Diff {

  /** Row-level diff of two keyed snapshots.
    *
    * @param prev previous snapshot
    * @param cur  current snapshot; both must carry `key` + `cols`
    * @param key  join key (unique per snapshot)
    * @param cols columns compared for `changed` status
    * @return one row per key in either snapshot:
    *         (key, status ∈ added|removed|changed|unchanged,
    *          changed_cols: sorted array of differing column names —
    *          empty unless status = changed)
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one compared column")
    require(!cols.contains(key),
      s"key '$key' must not appear in the compared cols (it can never differ)")
    // the join itself is null-safe (<=>): a null-keyed row present in
    // both snapshots matches itself instead of splitting into a
    // spurious removed+added pair. Since a matched null key leaves BOTH
    // key columns null, presence is tracked by literal marker columns,
    // not key nullness.
    val p = prev.select(lit(true).as("__in_prev") +:
      (key +: cols).map(c => col(c).as(s"p_$c")): _*)
    val c = cur.select(lit(true).as("__in_cur") +:
      (key +: cols).map(c0 => col(c0).as(s"c_$c0")): _*)
    val joined = p.join(c, col(s"p_$key") <=> col(s"c_$key"), "full_outer")
    val inPrev = col("__in_prev").isNotNull
    val inCur = col("__in_cur").isNotNull
    val diffs: Column = array_sort(filter(
      array(cols.map(cn =>
        when(!(col(s"p_$cn") <=> col(s"c_$cn")), lit(cn))): _*),
      x => x.isNotNull))
    joined.select(
      when(inCur, col(s"c_$key")).otherwise(col(s"p_$key")).as(key),
      when(!inPrev, lit("added"))
        .when(!inCur, lit("removed"))
        .when(size(diffs) > 0, lit("changed"))
        .otherwise(lit("unchanged")).as("status"),
      when(inPrev && inCur, diffs)
        .otherwise(array().cast("array<string>")).as("changed_cols"))
  }
}
