package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.UrlFns
import graft.sources.Tables

/** URL/domain analytics — the frontier-accounting face of a crawler:
  * per-registrable-domain page counts, host fan-out, and depth profile
  * are what politeness budgeting and crawl scheduling key on.
  */
object WebQueries {

  /** Per-domain crawl-budget rollup. The corpus carries no URL column,
    * so the query derives a deterministic URL per document (subdomain,
    * TLD, path shape, and an optional ?page= all functions of doc_id /
    * source / lang), then decomposes it with Spark's `parse_url` family
    * (`UrlFns`). The DuckDB twin re-derives the same URLs and splits
    * them with anchored regexes — on well-formed URLs the java.net.URI
    * and regex decompositions must agree, and the hash check proves they
    * do. `nullif` mirrors parse_url's null-on-absent query param. */
  val q79DomainBudget = Q(
    "q79_domain_budget",
    """WITH urls AS (
      |  SELECT doc_id,
      |    'https://' ||
      |      CASE doc_id % 3 WHEN 0 THEN 'www' WHEN 1 THEN 'm' ELSE 'static' END ||
      |      '.' || source ||
      |      CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN '.com' ELSE '.org' END ||
      |      CASE WHEN doc_id % 4 = 0 THEN '/' || lang
      |           ELSE '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) END ||
      |      CASE WHEN doc_id % 5 = 0 THEN ''
      |           ELSE '?page=' || CAST(doc_id % 7 AS VARCHAR) END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, url,
      |    regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
      |    regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
      |    nullif(regexp_extract(url, '[?&]page=([^&#]*)', 1), '') AS page
      |  FROM urls)
      |SELECT
      |  string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1] AS domain,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
      |  CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
      |  round(avg(len(string_split(path, '/')) - 1), 4) AS avg_depth,
      |  CAST(count(page) AS BIGINT) AS n_paged,
      |  CAST(sum(CAST(page AS INT)) AS BIGINT) AS page_total
      |FROM parts
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    val url = concat(
      lit("https://"),
      element_at(array(lit("www"), lit("m"), lit("static")),
        (col("doc_id") % 3).cast("int") + 1),
      lit("."), col("source"),
      when(substring(col("source"), 4, 10).cast("int") % 2 === 0, ".com").otherwise(".org"),
      when(col("doc_id") % 4 === 0, concat(lit("/"), col("lang")))
        .otherwise(concat(lit("/"), col("lang"), lit("/doc/"), col("doc_id").cast("string"))),
      when(col("doc_id") % 5 === 0, "")
        .otherwise(concat(lit("?page="), (col("doc_id") % 7).cast("string"))))
    Tables.documents(spark, dir)
      .select(col("doc_id"), url.as("url"))
      .select(col("url"),
        UrlFns.host(col("url")).as("host"),
        UrlFns.registrableDomain(col("url")).as("domain"),
        UrlFns.path(col("url")).as("path"),
        UrlFns.pathDepth(col("url")).as("depth"),
        UrlFns.queryParam(col("url"), "page").as("page"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("path")).as("n_paths"),
        round(avg(col("depth")), 4).as("avg_depth"),
        count(col("page")).as("n_paged"),
        sum(col("page").cast("int")).as("page_total"))
      .orderBy(col("domain"))
  }

  val all: Seq[Q] = Seq(q79DomainBudget)
}
