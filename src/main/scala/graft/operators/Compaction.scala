package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance operation
  * every large lake needs continuously: group many small files into
  * target-sized output bins so scans stop paying per-file open cost
  * and the file count stops growing unboundedly.
  *
  * The planner runs at file-METADATA grain (path, size), never at data
  * grain: assigning bins is one running-sum window per partition key
  * (files of one table partition are compacted together — compaction
  * never moves rows across partition boundaries), so planning a
  * 100 TB table costs a window over its file listing, and the actual
  * rewrite is then an embarrassingly parallel per-bin job.
  *
  * Bin rule: files ordered by `orderCol` within `keyCol`; a file's bin
  * is `floor(bytes-before-it / targetBytes)` — the greedy sequential
  * packer. Deterministic (no sampling), so the plan is reproducible
  * and relationally checkable; bins overshoot the target by at most
  * one file, the standard compaction contract.
  */
object Compaction {

  /** Adds a `bin` column to the file listing. */
  def assignBins(files: DataFrame, keyCol: String, orderCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    val prior = coalesce(
      sum(col(sizeCol)).over(Window.partitionBy(col(keyCol))
        .orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    // floor over a double quotient is exact while per-key cumulative
    // bytes < 2^53 (~9 PB per table partition) — far above any sane
    // partition; the relational twin's integer `//` agrees in that range
    files.withColumn("bin", floor(prior / targetBytes))
  }

  /** The compaction manifest: one row per (key, bin) with file count,
    * total bytes, and the ordered id range the bin covers. */
  def manifest(files: DataFrame, keyCol: String, orderCol: String,
      sizeCol: String, targetBytes: Long): DataFrame =
    assignBins(files, keyCol, orderCol, sizeCol, targetBytes)
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("total_bytes"),
        min(col(orderCol)).as("first_id"),
        max(col(orderCol)).as("last_id"))

  /** O(delta) incremental re-plan — the daily-ingest shape (the q94/
    * q125/q133 incremental-family contract applied to table
    * maintenance): when a batch of new files lands, only partitions
    * that RECEIVED files need re-planning; every other partition's
    * stored manifest is still valid, because bins are a pure function
    * of the partition's own file listing. The affected-key set (tiny —
    * the delta's distinct keys) broadcasts into a semi-join that prunes
    * the listing BEFORE the window, so re-planning cost tracks the
    * delta's partitions, never the table. Returns the refreshed
    * manifest rows for affected partitions only, with `n_new` counting
    * the delta files in each bin; the caller merges them over the
    * stored manifest by (key, bin). */
  def incrementalManifest(files: DataFrame, newFiles: DataFrame,
      keyCol: String, orderCol: String, sizeCol: String,
      targetBytes: Long): DataFrame = {
    // no broadcast HINT (registry audit trusts hints only on provably
    // bounded subtrees); AQE broadcasts the tiny distinct-key side of
    // the semi-join by size stats at runtime
    val affected = newFiles.select(col(keyCol)).distinct()
    val combined = files.withColumn("_new", lit(0L))
      .unionByName(newFiles.withColumn("_new", lit(1L)))
      .join(affected, Seq(keyCol), "left_semi")
    assignBins(combined, keyCol, orderCol, sizeCol, targetBytes)
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("_new")).as("n_new"),
        sum(col(sizeCol)).as("total_bytes"),
        min(col(orderCol)).as("first_id"),
        max(col(orderCol)).as("last_id"))
  }
}
