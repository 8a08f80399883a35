package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond the built-ins (SURVEY §2.4).
  *
  * The as-of join here is the "union + last(ignoreNulls) window" plan: it
  * needs exactly ONE shuffle (by key) and one sort within partitions —
  * no broadcast of either side, no range explosion — which is the shape
  * that survives 100 TB. A sort-merge-based custom SparkPlan would save
  * the union's extra columns but not the shuffle, so built-in composition
  * wins (preference order (a) in the build brief).
  */
object Joins {

  /** As-of join: for every left row, attach the payload of the latest
    * right row with the same key and strictly earlier timestamp
    * (SURVEY §2.4 "as-of (nearest prior event)": match a 成交 row to the
    * last prior listing state).
    *
    * @param left      probe side (id must be unique per row)
    * @param right     reference side whose latest-prior payload is wanted
    * @param key       equi-join key column name (same on both sides)
    * @param ts        event-time column name (same on both sides)
    * @param payload   right-side columns to carry; appear as `asof_<name>`
    * @param inclusive false → strictly-prior (ts_r < ts_l, the market-
    *                  data convention); true → ts_r ≤ ts_l (the SCD2
    *                  "effective as of" convention, where a version
    *                  starting AT the probe instant already applies)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], inclusive: Boolean = false): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select((key +: ts +: payload).map(col): _*).withColumn("__side", lit(2))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // strict: at equal ts a right row sorts AFTER the left row, so the
    // frame's -1 bound excludes it (ts_r < ts_l). inclusive: right rows
    // sort BEFORE left at equal ts and land inside the frame (ts_r ≤ ts_l).
    val sideOrder = if (inclusive) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), sideOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withPayload = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("__side") === 2, col(c)), ignoreNulls = true).over(w))
    }
    val dropRight = payload.filterNot(left.columns.contains)
    withPayload.filter(col("__side") === 1)
      .drop("__side").drop(dropRight: _*)
  }

  /** Forward as-of join: the EARLIEST right row strictly later than each
    * left row (next event after). Same one-shuffle union+window plan as
    * `asOf`, mirrored: right rows sort BEFORE left rows at equal ts, so
    * the frame's +1 lower bound excludes them — strict ts_r > ts_l.
    * Payload appears as `asofnext_<name>`. */
  def asOfNext(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select((key +: ts +: payload).map(col): _*).withColumn("__side", lit(2))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side").desc)
      .rowsBetween(1, Window.unboundedFollowing)
    val withPayload = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asofnext_$c",
        first(when(col("__side") === 2, col(c)), ignoreNulls = true).over(w))
    }
    val dropRight = payload.filterNot(left.columns.contains)
    withPayload.filter(col("__side") === 1)
      .drop("__side").drop(dropRight: _*)
  }

  /** Interval × interval overlap join by GRID BUCKETING — the equi-join
    * form of `a.start ≤ b.end AND b.start ≤ a.end`. A naive overlap
    * join has no equi-key, so Spark plans BroadcastNestedLoop (or worse,
    * a cartesian) — fine for one broadcast-able side, fatal when both
    * sides are fact-sized. Here each interval explodes to the fixed-width
    * day-grid cells it touches, the join is a plain hash equi-join on the
    * cell id, and the real overlap predicate filters the cell-collisions.
    *
    * Every overlapping pair is emitted EXACTLY once with no dedup
    * shuffle: the canonical-cell guard keeps only the join row whose
    * cell contains the overlap's start (`max` of the two starts), which
    * exists for every true overlap and is unique per pair.
    *
    * Scale: shuffle volume is rows × avg-cells-per-interval (pick
    * `bucketDays` ≈ the typical interval length so that factor stays
    * 1-2×); the join itself is AQE-skew-splittable because it is a
    * plain equi-join — none of which holds for the nested-loop form.
    *
    * @param aStart/aEnd,bStart/bEnd  DATE columns; both frames' column
    *                                 names must be disjoint
    * @return a.* ⋈ b.* + overlap_days (inclusive day count)
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketDays: Int): DataFrame = {
    require(bucketDays > 0, s"bucketDays must be positive, got $bucketDays")
    // the grid column is internal — an input column of the same name
    // would silently collide with it
    require(!(a.columns ++ b.columns).contains("__cell"),
      "inputs must not carry a __cell column")
    val epoch = lit("1970-01-01").cast("date")
    def cellOf(c: Column): Column =
      floor(datediff(c, epoch) / bucketDays).cast("int")
    // drop malformed intervals (end < start) explicitly: Spark's
    // `sequence(a, b)` would otherwise silently generate a DESCENDING
    // cell list (default step -1) and such rows could surface with
    // non-positive overlap_days
    def cells(s: String, e: String)(df: DataFrame): DataFrame =
      df.filter(col(s) <= col(e)).withColumn("__cell",
        explode(sequence(cellOf(col(s)), cellOf(col(e)))))
    cells(aStart, aEnd)(a).join(cells(bStart, bEnd)(b), Seq("__cell"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__cell") === cellOf(greatest(col(aStart), col(bStart))))
      .withColumn("overlap_days",
        datediff(least(col(aEnd), col(bEnd)), greatest(col(aStart), col(bStart))) + 1)
      .drop("__cell")
  }
}
