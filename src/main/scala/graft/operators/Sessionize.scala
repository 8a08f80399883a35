package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization (SURVEY §2.10): both the built-in `session_window`
  * (works on static AND streaming DataFrames) and an explicit
  * gap-and-cumsum variant that exposes per-event session ids.
  *
  * Both plans shuffle once on the user key. The explicit variant's window
  * functions sort within partitions — no extra exchange.
  */
object Sessionize {

  /** Built-in session windows: one row per (key, session). */
  def sessionWindows(events: DataFrame, key: Column, ts: Column, gap: String): DataFrame =
    events.groupBy(key, session_window(ts, gap))
      .agg(count(lit(1)).as("n_events"))

  /** Explicit sessionization: tags every event with a session id
    * (1-based, per key, in time order). A new session starts when the
    * gap since the previous event is strictly > `gapSeconds` — the same
    * split rule as `session_window` (verified in SessionizeSpec: an
    * event landing exactly at prev+gap still merges). */
  def tagSessions(events: DataFrame, key: String, ts: String,
      tiebreak: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    events
      .withColumn("__prev_ts", lag(col(ts), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          col(ts).cast("double") - col("__prev_ts").cast("double") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_ts", "__new_session")
  }
}
