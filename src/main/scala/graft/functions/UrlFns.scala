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

  /** Canonical URL form for frontier/dupe-filter keying — the
    * normalizer every crawler runs so that trivially-different spellings
    * of one resource collapse to one frontier entry (RFC 3986 §6
    * normalizations that are safe without fetching):
    * scheme + host lowercased, the scheme's OWN default port stripped
    * (:80 only under http, :443 only under https — http://h:443/x is a
    * different resource from http://h/x and must stay distinct),
    * fragment dropped, query parameters SORTED (the big one — servers
    * overwhelmingly treat the query as a map), path's trailing slash
    * trimmed (non-root). The query is anchored to the part BEFORE the
    * first '#', so fragment bytes like "#?a=1" can never masquerade as
    * a query. Pure string expressions (RE2-safe regexes, the same in
    * the DuckDB twin) rather than `parse_url`, so both engines compute
    * the identical canonical string byte-for-byte. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val hostNoDefault = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val trimmed = regexp_replace(rawPath, "/$", "")
    val pathNorm = when(trimmed === "", lit("/")).otherwise(trimmed)
    // [^#?]* pins the match to the FIRST '?', and only if it precedes
    // any '#' — a '?' inside the fragment is not a query
    val q = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val sortedQ = concat_ws("&", array_sort(filter(split(q, "&"), p => p =!= "")))
    concat(scheme, lit("://"), hostNoDefault, pathNorm,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }
}
