package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q157 constant-factor A/B (r12 verdict #7): the sitemap frontier's
  * extraction stage as (a) the registered native XPathArrayExpr
  * one-parse form vs (b) a `regexp_extract_all` form that mirrors the
  * DuckDB oracle. The XML here is SYNTHESIZED well-formed sitemaps, so
  * the regex form is semantically exact for this query; the XPath
  * form remains the general-XML path and stays exercised by q136/q136's
  * contract regardless of which serves q157.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.DiagQ157
  */
object DiagQ157 {

  private def sitemaps(spark: SparkSession, dir: String): DataFrame = {
    def entry(mul: Int, add: Int, shift: Int) = concat(
      lit("<url><loc>https://"), col("source"), lit(".example.com/d"),
      (col("doc_id") * mul + add).cast("string"), lit("</loc><lastmod>2024-01-"),
      lpad(((col("doc_id") + shift) % 28 + 1).cast("string"), 2, "0"),
      lit("</lastmod></url>"))
    graft.sources.Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(lit("<urlset>"), entry(3, 0, 0), entry(3, 1, 7), entry(3, 2, 14),
        lit("</urlset>")).as("xml"))
  }

  private def finish(pairs: DataFrame): Long = {
    val visited = (conv(substring(md5(col("loc")), 1, 15), 16, 10)
      .cast("long") % 3) === 0
    pairs
      .withColumn("on_frontier", !visited)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("on_frontier"), 1L).otherwise(0L)).as("n_frontier"),
        min(when(col("on_frontier"), col("lastmod"))).as("min_lastmod"),
        max(when(col("on_frontier"), col("lastmod"))).as("max_lastmod"))
      .orderBy(col("source"))
      .collect().length.toLong
  }

  def xpathForm(spark: SparkSession, dir: String): Long = {
    val pairs = sitemaps(spark, dir)
      .select(col("source"),
        graft.plans.XPathStructExpr.xpathAll(col("xml"),
          "/urlset/url/loc/text() | /urlset/url/lastmod/text()").as("nodes"))
      .select(col("source"), col("nodes"),
        posexplode(col("nodes")).as(Seq("i0", "v")))
      .filter(col("i0") % 2 === 0)
      .select(col("source"), col("v").as("loc"),
        element_at(col("nodes"), col("i0") + 2).as("lastmod"))
    finish(pairs)
  }

  def regexForm(spark: SparkSession, dir: String): Long = {
    val pairs = sitemaps(spark, dir)
      .select(col("source"),
        regexp_extract_all(col("xml"), lit("<loc>([^<]*)</loc>"), lit(1)).as("locs"),
        regexp_extract_all(col("xml"), lit("<lastmod>([^<]*)</lastmod>"), lit(1)).as("mods"))
      .select(col("source"), col("mods"),
        posexplode(col("locs")).as(Seq("i0", "loc")))
      .select(col("source"), col("loc"),
        element_at(col("mods"), col("i0") + 1).as("lastmod"))
    finish(pairs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // parity first: both forms must produce identical aggregates
    val a = xpathForm(spark, sfDir); val b = regexForm(spark, sfDir)
    require(a == b, s"row-count mismatch: xpath=$a regex=$b")
    for (rep <- 1 to 3) {
      for ((name, f) <- Seq("xpath" -> (() => xpathForm(spark, sfDir)),
          "regex" -> (() => regexForm(spark, sfDir)))) {
        val t0 = System.nanoTime()
        f()
        println(f"[diag-q157] rep=$rep $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
