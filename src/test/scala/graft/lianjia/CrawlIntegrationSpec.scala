package graft.lianjia

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Iterate

/** End-to-end crawl: Iterate.fixpoint (G9) composing the G1-G8 operators
  * over a synthetic pre-fetched site — the whole reference dataflow
  * (seed → districts → villages → listing pages incl. pagination →
  * house details → typed tables joined on the 小区ID FK) in one run.
  */
class CrawlIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val B = Pipeline.Base

  private def villagePage(name: String) =
    s"""<html><body><h1 class="detailTitle">$name</h1>
       |<a class="crumb">浦东</a><a class="crumb">联洋</a>
       |<span class="xiaoquInfoContent year">2005年建成</span>
       |<li><span>楼栋总数</span>10栋</li>
       |<script>resblockPosition:'121.5,31.2',x</script>
       |</body></html>""".stripMargin

  private def housePage(price: String, deal: Boolean) =
    s"""<html><body><h1 class="main">房源</h1>
       |${if (deal) s"""<span class="dealTotalPrice"><i>$price</i></span>
       |<div class="wrapper">2021.5.1 成交</div>"""
    else s"""<span class="total">$price</span><span class="count">7</span>"""}
       |<div class="communityName"><a class="info" href="/xiaoqu/101/">小区A</a></div>
       |<li><span>建筑面积</span>99.9㎡</li>
       |</body></html>""".stripMargin

  // the pre-fetched site: 1 root → 1 district → village 101 →
  // (ershoufang c101 with 2 pages, chengjiao c101 with 1 page) → 3 houses
  private lazy val pages: DataFrame = Seq(
    s"$B/xiaoqu/" ->
      """<div><a href="/xiaoqu/pudong/">浦东</a></div>""",
    s"$B/xiaoqu/pudong/" ->
      """<div data-total-count="1"><a href="https://sh.lianjia.com/xiaoqu/101/">A</a></div>
        |<div page-data='{"curPage":1,"totalPage":1}'>x</div>""".stripMargin,
    s"$B/xiaoqu/101/" -> villagePage("小区A"),
    s"$B/ershoufang/c101" ->
      """<div data-total-count="2"><a href="https://sh.lianjia.com/ershoufang/1001.html">h</a></div>
        |<div page-data='{"curPage":1,"totalPage":2}'>x</div>""".stripMargin,
    s"$B/ershoufang/c101pg2" ->
      """<div data-total-count="2"><a href="https://sh.lianjia.com/ershoufang/1002.html">h</a></div>
        |<div page-data='{"curPage":2,"totalPage":2}'>x</div>""".stripMargin,
    s"$B/chengjiao/c101" ->
      """<div data-total-count="1"><a href="https://sh.lianjia.com/chengjiao/2001.html">h</a></div>
        |<div page-data='{"curPage":1,"totalPage":1}'>x</div>""".stripMargin,
    s"$B/ershoufang/1001.html" -> housePage("1250", deal = false),
    s"$B/ershoufang/1002.html" -> housePage("890", deal = false),
    s"$B/chengjiao/2001.html" -> housePage("980", deal = true)
  ).toDF("url", "html")

  /** One crawl step: fetch frontier pages, apply the operator matching
    * each page type, emit new frontier urls. */
  private def step(frontier: DataFrame): DataFrame = {
    val fetched = frontier.select("url").join(pages, Seq("url"))
    val districts = Pipeline.regionLinks(
      fetched.filter(col("url") === s"$B/xiaoqu/"), "^/xiaoqu/[a-z]+/$")
    val villageLinks = Pipeline.detailLinks(
      fetched.filter(col("url").rlike("/xiaoqu/[a-z]+/$")),
      "^https://sh\\.lianjia\\.com/xiaoqu/\\d+/$")
    val childLists = Pipeline.villageChildLinks(
      fetched.filter(col("url").rlike("/xiaoqu/\\d+/$"))).select(col("village_id").as("ref"), col("url"))
    val houseLinks = Pipeline.detailLinks(
      fetched.filter(col("url").rlike("/(ershoufang|chengjiao)/c\\d+(pg\\d+)?$")),
      "^https://sh\\.lianjia\\.com/(ershoufang|chengjiao)/\\d+\\.html$")
    val morePages = Pipeline.paginationLinks(
      fetched.filter(col("url").rlike("/(ershoufang|chengjiao)/c\\d+$")))
    districts.unionByName(villageLinks).unionByName(childLists)
      .unionByName(houseLinks).unionByName(morePages)
      .select("url")
  }

  test("full crawl: fixpoint visits every page exactly once; typed tables join on FK") {
    val seed = Seq(s"$B/xiaoqu/").toDF("url")
    val visited = Iterate.fixpoint(seed, step, Seq("url"), maxIter = 10)

    // every page reachable — including the pagination-generated pg2 —
    // and nothing else (fixpoint didn't loop or invent urls)
    assert(visited.count() === pages.count())
    assert(visited.join(pages, Seq("url"), "left_anti").count() === 0)

    val visitedPages = visited.join(pages, Seq("url"))
    val villages = Pipeline.typedVillages(Pipeline.villageItems(
      visitedPages.filter(col("url").rlike("/xiaoqu/\\d+/$"))))
    val houses = Pipeline.typedHouses(Pipeline.unionHouses(
      Pipeline.onsaleHouseItems(visitedPages.filter(col("url").rlike("/ershoufang/\\d+\\.html$"))),
      Pipeline.soldHouseItems(visitedPages.filter(col("url").rlike("/chengjiao/\\d+\\.html$")))))

    assert(villages.count() === 1)
    assert(houses.count() === 3)
    assert(houses.filter(col("状态") === "在售").count() === 2)

    // the FK born at fan-out time (villageChildLinks) survives to the
    // typed tables: every house joins its village
    val joined = houses.join(villages, houses("小区ID") === villages("id"))
    assert(joined.count() === 3)
    assert(joined.select("name").distinct().as[String].head() === "小区A")

    // sold row carries the deal fields, on-sale rows don't
    val sold = houses.filter(col("状态") === "成交")
    assert(sold.select(col("成交价").cast("double")).as[Double].head() === 980.0)
    assert(sold.select(col("成交时间").cast("string")).as[String].head() === "2021-05-01")
  }
}
