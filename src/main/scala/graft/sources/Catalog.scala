package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-resolution seam: logical table name → DataFrame.
  *
  * Queries never hard-code a physical layout; they ask a Catalog. At
  * test scale that's parquet files under an sf directory; at 100 TB the
  * same names resolve to managed (bucketed, partitioned) catalog tables
  * — `Sinks.writeBucketed` output — and no query code changes.
  */
trait Catalog {
  def table(spark: SparkSession, name: String): DataFrame
}

object Catalog {

  /** The testdata layout: `<dir>/<name>.parquet`, with `events` routed
    * through the nanos conversion. */
  def parquetDir(dir: String): Catalog = new Catalog {
    def table(spark: SparkSession, name: String): DataFrame =
      Tables.byName(spark, dir, name)
  }

  /** Session-catalog tables (managed/bucketed/views) — the production
    * resolver. */
  def session: Catalog = new Catalog {
    def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
  }
}
