package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lianjia.Extract

class XPathStructExprSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html><body>
      |<h1 class="t">标题文本</h1>
      |<li><span>房屋户型</span>3室2厅</li>
      |<li><span>装修情况</span>精装</li>
      |</body></html>""".stripMargin

  private val fields = Seq(
    "title" -> "//h1[@class='t']/text()",
    "layout" -> "//li[span='房屋户型']/text()",
    "deco" -> "//li[span='装修情况']/text()",
    "missing" -> "//li[span='不存在']/text()")

  test("one-parse struct matches per-field xpathFirst; misses are null") {
    val df = Seq(page).toDF("html")
    val viaStruct = df.select(XPathStructExpr.xpathStruct(col("html"), fields).as("x"))
      .select("x.title", "x.layout", "x.deco", "x.missing")
      .as[(String, String, String, Option[String])].head()
    val viaSingle = df.select(
      Extract.xpathFirst(col("html"), fields(0)._2),
      Extract.xpathFirst(col("html"), fields(1)._2),
      Extract.xpathFirst(col("html"), fields(2)._2),
      Extract.xpathFirst(col("html"), fields(3)._2))
      .as[(String, String, String, Option[String])].head()
    assert(viaStruct === viaSingle)
    assert(viaStruct === (("标题文本", "3室2厅", "精装", None)))
  }

  test("unparseable page yields an all-null struct, not a failed task (F4)") {
    val got = Seq("<html><unclosed").toDF("html")
      .select(XPathStructExpr.xpathStruct(col("html"), fields).as("x"))
      .select("x.title", "x.missing")
      .as[(Option[String], Option[String])].head()
    assert(got === ((None, None)))
  }

  test("doctype/entity payloads are rejected safely (no XXE)") {
    val evil =
      """<!DOCTYPE foo [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
        |<html><h1 class="t">&xxe;</h1></html>""".stripMargin
    val got = Seq(evil).toDF("html")
      .select(XPathStructExpr.xpathStruct(col("html"), fields).as("x"))
      .select("x.title").as[Option[String]].head()
    // The strict parser rejects the DOCTYPE outright; the tag-soup repair
    // then strips it and neutralizes the entity reference into inert
    // literal text ("&xxe;"). Either way the external entity must never
    // be RESOLVED — the assertion is on the security property, not the
    // recovery path.
    assert(got === Some("&xxe;"))
    assert(!got.get.contains("root:"))
  }
}
