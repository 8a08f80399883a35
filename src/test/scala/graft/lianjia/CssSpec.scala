package graft.lianjia

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Css.toXPath translation + cssFirst/cssAll end-to-end over the page
  * shapes the reference's css() calls target (lianjia.py:48,63,105,127-130). */
class CssSpec extends SparkSpec {
  import spark.implicits._

  test("translation covers the reference's selector forms") {
    assert(Css.toXPath("a") === "//a")
    assert(Css.toXPath(".total") ===
      "//*[contains(concat(' ',normalize-space(@class),' '),' total ')]")
    assert(Css.toXPath("a.info::attr(href)") ===
      "//a[contains(concat(' ',normalize-space(@class),' '),' info ')]/@href")
    assert(Css.toXPath("div[data-role='ershoufang'] a::attr(href)") ===
      "//div[@data-role='ershoufang']//a/@href")
    assert(Css.toXPath(".xiaoquInfo .xiaoquInfoItem:nth-child(2) .xiaoquInfoContent::text")
      .contains("count(preceding-sibling::*)=1"))
    assert(Css.toXPath("div:first-child > span::text") ===
      "//div[not(preceding-sibling::*)]/span/text()")
    intercept[IllegalArgumentException](Css.toXPath("a ~ b"))
  }

  // the reference's sold-listing result header (lianjia.py:105):
  // css('.resultDes .total span::text') — class-scoped, and the page
  // is tag soup (unclosed div, bare &)
  private val listingHtml =
    """<html><body>
      |<div class="resultDes clear">
      |  <h2 class="total fl">共找到<span> 4887 </span>套成交房源 & 更新中
      |<div class="other"><span> 9999 </span></div>
      |</body></html>""".stripMargin

  test("cssFirst: class-scoped ::text on a tag-soup page") {
    val df = Seq(listingHtml).toDF("html")
    val got = df.select(Extract.cssFirst(col("html"), ".resultDes .total span::text").as("v"))
      .as[String].head()
    assert(got === "4887")
  }

  test("cssFirst: ::attr and nth-child scoping") {
    val html =
      """<div class="xiaoquInfo">
        |<div class="xiaoquInfoItem"><span class="xiaoquInfoContent">2003年建成</span></div>
        |<div class="xiaoquInfoItem"><span class="xiaoquInfoContent">板楼</span></div>
        |</div><a class="info" href="/xiaoqu/42/">x</a>""".stripMargin
    val df = Seq(html).toDF("html")
    assert(df.select(Extract.cssFirst(col("html"),
      ".xiaoquInfo .xiaoquInfoItem:nth-child(2) .xiaoquInfoContent::text").as("v"))
      .as[String].head() === "板楼")
    assert(df.select(Extract.cssFirst(col("html"), "a.info::attr(href)").as("v"))
      .as[String].head() === "/xiaoqu/42/")
  }

  test("cssAll: extract() list semantics incl. misses → empty array") {
    val html =
      """<div class="listContent"><div class="xiaoquListItem">
        |<a class="img" href="/xiaoqu/1/">a</a></div>
        |<div class="xiaoquListItem"><a class="img" href="/xiaoqu/2/">b</a></div></div>"""
        .stripMargin
    val df = Seq(html).toDF("html")
    assert(df.select(Extract.cssAll(col("html"),
      ".listContent .xiaoquListItem a.img::attr(href)").as("v"))
      .as[Seq[String]].head() === Seq("/xiaoqu/1/", "/xiaoqu/2/"))
    assert(df.select(Extract.cssAll(col("html"), ".absent b::text").as("v"))
      .as[Seq[String]].head() === Seq.empty)
  }
}
