package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Schema-driven column profiler (the Deequ/Glue-crawler statistic set):
  * for EVERY column of any DataFrame — row count, null count, distinct
  * count, numeric min/max — computed in a single aggregate job and
  * returned in long form, one row per column.
  *
  * The agg expressions are generated from the schema at plan time, so
  * profiling a 300-column table is still ONE pass over the data (the
  * multi-count-distinct plans through Spark's Expand — k·rows map-side,
  * one shuffle — where a per-column loop would be k separate scans; at
  * 100 TB that's the difference between an afternoon and a coffee).
  * Min/max are reported for numeric columns only: cross-type values
  * would force everything through engine-specific string formatting,
  * which is exactly the non-portable surface an oracle-checked profiler
  * must avoid. */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val (mn, mx) =
        if (f.dataType.isInstanceOf[NumericType])
          (min(c).cast("double"), max(c).cast("double"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      Seq(count(c).as(s"${f.name}__nn"),
        countDistinct(c).as(s"${f.name}__nd"),
        mn.as(s"${f.name}__mn"), mx.as(s"${f.name}__mx"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(fields.map { f =>
      struct(lit(f.name).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${f.name}__nn")).as("n_nulls"),
        col(s"${f.name}__nd").as("n_distinct"),
        round(col(s"${f.name}__mn"), 4).as("min_num"),
        round(col(s"${f.name}__mx"), 4).as("max_num"))
    }: _*)
    one.select(explode(rows).as("p")).select(col("p.*"))
  }
}
