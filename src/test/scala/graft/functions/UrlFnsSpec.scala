package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlFnsSpec extends SparkSpec {
  import spark.implicits._

  private def parts(url: String): (String, String, String, Int, String) =
    Seq(url).toDF("u").select(
      UrlFns.host(col("u")), UrlFns.path(col("u")),
      UrlFns.registrableDomain(col("u")), UrlFns.pathDepth(col("u")),
      UrlFns.queryParam(col("u"), "pg"))
      .as[(String, String, String, Int, String)].head()

  test("decomposes a listing URL like the reference's pagination space") {
    val (host, path, domain, depth, pg) =
      parts("https://sh.lianjia.com/xiaoqu/pudong/?pg=2&order=asc")
    assert(host === "sh.lianjia.com")
    assert(path === "/xiaoqu/pudong/")
    assert(domain === "lianjia.com")
    assert(depth === 2)
    assert(pg === "2")
  }

  test("absent query param is null, root path depth is 0") {
    val (host, path, domain, depth, pg) = parts("https://example.org/")
    assert(host === "example.org" && domain === "example.org")
    assert(path === "/" && depth === 0)
    assert(pg == null)
  }

  test("malformed URL yields nulls, not garbage") {
    val got = Seq("not a url at all").toDF("u")
      .select(UrlFns.host(col("u")), UrlFns.queryParam(col("u"), "pg"))
      .as[(String, String)].head()
    assert(got._1 == null && got._2 == null)
  }

  test("canonicalizeUrl: case, default ports, fragment, param order, slashes") {
    def canon(u: String): String = Seq(u).toDF("u")
      .select(UrlFns.canonicalizeUrl(col("u"))).as[String].head()
    // every spelling of one resource collapses to one canonical form
    assert(canon("HTTPS://Example.COM:443/a/?b=2&a=1#frag") === "https://example.com/a?a=1&b=2")
    assert(canon("https://example.com/a?a=1&b=2") === "https://example.com/a?a=1&b=2")
    assert(canon("HTTP://example.com:80/x") === "http://example.com/x")
    // non-default port survives; root path normalizes to "/"
    assert(canon("https://example.com:8443/") === "https://example.com:8443/")
    assert(canon("https://example.com") === "https://example.com/")
    // no query → no "?", fragment alone is dropped
    assert(canon("https://example.com/p#only-frag") === "https://example.com/p")
    // a default port for the OTHER scheme is a real port — keep it
    assert(canon("http://example.com:443/x") === "http://example.com:443/x")
    assert(canon("https://example.com:80/x") === "https://example.com:80/x")
    // a '?' inside the fragment is not a query
    assert(canon("http://example.com/p#?a=1") === "http://example.com/p")
    // query stays anchored at the FIRST '?' even with a later one
    assert(canon("http://example.com/p?b=2?x&a=1") === "http://example.com/p?a=1&b=2?x")
  }
}
