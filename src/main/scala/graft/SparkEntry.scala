package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.queries.*` as `Q(name, oracleSql)(impl)`
  * triples so the Spark implementation and its DuckDB oracle stay
  * side-by-side; this object just flattens the registry into the maps the
  * driver consumes.
  */
object SparkEntry {

  /** Every registered query, in registration order. */
  val registry: Seq[Q] =
    RelationalQueries.all ++ EventQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ MultimodalQueries.all ++ GraphQueries.all ++ WebQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
