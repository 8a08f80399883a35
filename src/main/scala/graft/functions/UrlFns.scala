package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition for crawl/frontier analytics — the per-domain
  * bookkeeping a polite crawler runs constantly (reference: the
  * listing/pagination URL spaces of the lianjia spider,
  * `lianjia.py:56-75`). All helpers ride Spark's codegen'd `parse_url`
  * (java.net.URI semantics: null, not garbage, on malformed input).
  */
object UrlFns {

  def host(url: Column): Column = try_parse_url(url, lit("HOST"))

  def path(url: Column): Column = try_parse_url(url, lit("PATH"))

  /** Value of one query parameter; null when absent. */
  def queryParam(url: Column, key: String): Column =
    try_parse_url(url, lit("QUERY"), lit(key))

  /** Last two host labels — the registrable domain under single-label
    * public suffixes (com/org/net). A full public-suffix list is a data
    * file, not a different algorithm; this is the crawl-budget key. */
  def registrableDomain(url: Column): Column =
    substring_index(host(url), ".", -2)

  /** Number of non-empty path segments: "/a/b/c" and "/a/b/c/" → 3,
    * "/" and "" → 0. */
  def pathDepth(url: Column): Column =
    size(filter(split(path(url), "/"), seg => seg =!= ""))
}
