package graft.lianjia

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's crawl dataflow (SURVEY §2.3 G1-G8) as composable
  * `DataFrame => DataFrame` transforms over a `(url, html)` page table.
  *
  * Input model: pages are pre-fetched — network IO is out of scope
  * (SURVEY §2.1 S2); a page table at 100 TB is a parquet/warehouse scan.
  * Each operator is 1 page row → N rows (links or items): the reference's
  * generator callbacks become `explode` fan-outs, pagination `range`
  * loops become `sequence`+`explode` (C13), and guards F1-F3 become
  * `filter`s.
  */
object Pipeline {

  val Base = "https://sh.lianjia.com"

  /** G1/G2: root/district page → child region links, keeping the parent
    * url as lineage (the reference's `meta={"ref": url}`). */
  def regionLinks(pages: DataFrame, urlPattern: String): DataFrame =
    pages.select(col("url").as("ref"),
        explode(Extract.hrefsMatching(col("html"), urlPattern)).as("link"))
      .select(col("ref"), concat(lit(Base), col("link")).as("url"))

  /** G3/G5/G7 (link half): listing page → detail-page links, guarded by
    * F1 (`total > 0`). */
  def detailLinks(pages: DataFrame, urlPattern: String): DataFrame =
    pages
      .filter(coalesce(Extract.totalCount(col("html")), lit(1)) > 0)
      .select(col("url").as("ref"),
        explode(Extract.hrefsMatching(col("html"), urlPattern)).as("url"))

  /** G3/G5/G7 (pagination half): listing page → page-2..N urls.
    * F2 (only from curPage==1) + F3 (totalPage>1) + C13 (sequence). */
  def paginationLinks(pages: DataFrame): DataFrame =
    pages
      .withColumn("pd", Extract.pageData(col("html")))
      .filter(col("pd.curPage") === 1 && col("pd.totalPage") > 1)
      .select(col("url").as("ref"),
        explode(sequence(lit(2), col("pd.totalPage"))).as("pg"))
      .select(col("ref"), concat(col("ref"), lit("pg"), col("pg")).as("url"))

  /** G4 (item half): village detail page → one village row (bronze:
    * all-string, null on extraction miss — FIXTURES A1). */
  def villageItems(pages: DataFrame): DataFrame =
    pages.select(
      Extract.urlKey(col("url"), Base + "/xiaoqu/", "/").as("id"),
      Extract.xpathFirst(col("html"), "//h1[@class='detailTitle']/text()").as("name"),
      Extract.zoneArray(col("html")).as("zone"),
      Extract.xpathFirst(col("html"), "//div[@class='detailDesc']/text()").as("address"),
      Extract.geoLat(col("html")).as("latitude"),
      Extract.geoLng(col("html")).as("longitude"),
      Extract.xpathFirst(col("html"), "//span[@class='xiaoquInfoContent year']/text()").as("year_raw"),
      Extract.xpathFirst(col("html"), "//li[span='建筑类型']/text()").as("build_type"),
      Extract.xpathFirst(col("html"), "//li[span='物业费用']/text()").as("property_costs"),
      Extract.xpathFirst(col("html"), "//li[span='物业公司']/text()").as("property_company"),
      Extract.xpathFirst(col("html"), "//li[span='开发商']/text()").as("developers"),
      Extract.xpathFirst(col("html"), "//li[span='楼栋总数']/text()").as("buildings_raw"),
      Extract.xpathFirst(col("html"), "//li[span='房屋总数']/text()").as("total_house_raw"),
      Extract.scrapeTime().as("采集时间"))

  /** G4 (fan-out half): village page → its two house-listing child urls
    * (`/ershoufang/c<id>` + `/chengjiao/c<id>`, lianjia.py:95-99) — the
    * FK 小区ID is born here. */
  def villageChildLinks(pages: DataFrame): DataFrame =
    pages
      .select(Extract.urlKey(col("url"), Base + "/xiaoqu/", "/").as("village_id"))
      .select(col("village_id"), explode(array(
        concat(lit(Base + "/ershoufang/c"), col("village_id")),
        concat(lit(Base + "/chengjiao/c"), col("village_id")))).as("url"))

  private def houseCommon(pages: DataFrame) = Seq(
    Extract.xpathFirst(col("html"), "//h1[@class='main']/text()").as("标题"),
    Extract.xpathFirst(col("html"), "//div[@class='communityName']/a[1]/text()").as("小区"),
    Extract.xpathFirst(col("html"), "//li[span='房屋户型']/text()").as("房屋户型"),
    Extract.xpathFirst(col("html"), "//li[span='所在楼层']/text()").as("所在楼层"),
    Extract.xpathFirst(col("html"), "//li[span='建筑面积']/text()").as("建筑面积_raw"),
    Extract.xpathFirst(col("html"), "//li[span='户型结构']/text()").as("户型结构"),
    Extract.xpathFirst(col("html"), "//li[span='套内面积']/text()").as("套内面积_raw"),
    Extract.xpathFirst(col("html"), "//li[span='建筑类型']/text()").as("建筑类型"),
    Extract.xpathFirst(col("html"), "//li[span='房屋朝向']/text()").as("房屋朝向"),
    Extract.xpathFirst(col("html"), "//li[span='装修情况']/text()").as("装修情况"),
    Extract.xpathFirst(col("html"), "//li[span='建筑结构']/text()").as("建筑结构"),
    Extract.xpathFirst(col("html"), "//li[span='梯户比例']/text()").as("梯户比例"),
    Extract.xpathFirst(col("html"), "//li[span='配备电梯']/text()").as("配备电梯"),
    Extract.xpathFirst(col("html"), "//li[span='供暖方式']/text()").as("供暖方式"),
    Extract.xpathFirst(col("html"), "//li[span='建成年代']/text()").as("建成年代_raw"),
    Extract.xpathFirst(col("html"), "//li[span='挂牌时间']/text()").as("挂牌时间_raw"),
    Extract.xpathFirst(col("html"), "//li[span='上次交易']/text()").as("上次交易_raw"),
    Extract.xpathFirst(col("html"), "//li[span='交易权属']/text()").as("交易权属"),
    Extract.xpathFirst(col("html"), "//li[span='房屋用途']/text()").as("房屋用途"),
    Extract.xpathFirst(col("html"), "//li[span='房屋年限']/text()").as("房屋年限"),
    Extract.xpathFirst(col("html"), "//li[span='产权所属']/text()").as("产权所属"),
    Extract.xpathFirst(col("html"), "//li[span='房权所属']/text()").as("房权所属"),
    Extract.xpathFirst(col("html"), "//li[span='抵押信息']/text()").as("抵押信息"),
    Extract.xpathFirst(col("html"), "//li[span='房源核验码']/text()").as("房源核验码"),
    Extract.xpathFirst(col("html"), "//li[span='房本备件']/text()").as("房本备件"),
    Extract.xpathFirst(col("html"), "//li[span='产权年限']/text()").as("产权年限"),
    Extract.scrapeTime().as("采集时间"))

  /** G6: on-sale house detail page → one bronze house row (状态=在售).
    * 34-column wide select — ONE page parse feeding many extracts. */
  def onsaleHouseItems(pages: DataFrame): DataFrame =
    pages.select(Seq(
      Extract.urlKey(col("url"), Base + "/ershoufang/", ".html").as("房屋Id"),
      Extract.xpathFirst(col("html"), "//span[@class='total']/text()").as("售价_raw"),
      Extract.xpathFirst(col("html"), "//div[@class='communityName']/a[@class='info']/@href").as("小区href"),
      Extract.xpathFirst(col("html"), "//span[@class='count']/text()").as("关注人数_raw"),
      Extract.xpathFirst(col("html"), "//li[span='链家编号']/text()").as("链家编号"),
      lit("在售").as("状态")) ++ houseCommon(pages): _*)
    .withColumn("小区ID", Extract.urlKey(col("小区href"), "/xiaoqu/", "/")).drop("小区href")

  /** G8: sold house detail page → one bronze house row (状态=成交).
    * Sold rows fill 成交价/成交时间, lack 关注人数/链家编号 — the sparse
    * union shape (FIXTURES A2). */
  def soldHouseItems(pages: DataFrame): DataFrame =
    pages.select(Seq(
      Extract.urlKey(col("url"), Base + "/chengjiao/", ".html").as("房屋Id"),
      Extract.xpathFirst(col("html"), "//span[@class='dealTotalPrice']/i/text()").as("成交价_raw"),
      Extract.xpathFirst(col("html"), "//div[@class='price']/b/text()").as("售价_raw"),
      Extract.xpathFirst(col("html"), "//div[@class='wrapper']/text()").as("成交时间_raw"),
      Extract.xpathFirst(col("html"), "//div[@class='communityName']/a[@class='info']/@href").as("小区href"),
      lit("成交").as("状态")) ++ houseCommon(pages): _*)
    .withColumn("小区ID", Extract.urlKey(col("小区href"), "/xiaoqu/", "/")).drop("小区href")

  /** on-sale ∪ sold into the single house table (SURVEY §2.8 union;
    * missing columns null-filled). */
  def unionHouses(onsale: DataFrame, sold: DataFrame): DataFrame =
    onsale.unionByName(sold, allowMissingColumns = true)

  /** Bronze → silver typing stage (FIXTURES A1/A2 silver column types):
    * the cleansing casts the reference interleaves with extraction,
    * isolated as one testable operator. */
  def typedVillages(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("year", Extract.leadingInt(col("year_raw"))).drop("year_raw")
      .withColumn("buildings", Extract.leadingInt(col("buildings_raw"))).drop("buildings_raw")
      .withColumn("total_house", Extract.leadingInt(col("total_house_raw"))).drop("total_house_raw")
      // 0-sentinel geo → null (lianjia.py:64-65 failure sentinel)
      .withColumn("latitude", nullif(col("latitude"), lit(0.0)))
      .withColumn("longitude", nullif(col("longitude"), lit(0.0)))

  def typedHouses(bronze: DataFrame): DataFrame = {
    val withCommon = bronze
      .withColumn("建筑面积", Extract.leadingDouble(col("建筑面积_raw"))).drop("建筑面积_raw")
      .withColumn("套内面积", Extract.leadingDouble(col("套内面积_raw"))).drop("套内面积_raw")
      .withColumn("售价", Extract.leadingDouble(col("售价_raw")).cast("decimal(12,2)")).drop("售价_raw")
      .withColumn("挂牌时间", to_date(col("挂牌时间_raw"))).drop("挂牌时间_raw")
      .withColumn("上次交易", to_date(col("上次交易_raw"))).drop("上次交易_raw")
      .withColumn("建成年代", Extract.leadingInt(col("建成年代_raw"))).drop("建成年代_raw")
    val sold = Seq("成交价_raw", "成交时间_raw", "关注人数_raw")
      .filter(withCommon.columns.contains)
    sold.foldLeft(withCommon) {
      case (df, "成交价_raw") => df.withColumn("成交价",
        Extract.leadingDouble(col("成交价_raw")).cast("decimal(12,2)")).drop("成交价_raw")
      case (df, "成交时间_raw") => df.withColumn("成交时间",
        Extract.dealDate(col("成交时间_raw"))).drop("成交时间_raw")
      case (df, "关注人数_raw") => df.withColumn("关注人数",
        Extract.leadingInt(col("关注人数_raw"))).drop("关注人数_raw")
      case (df, _) => df
    }
  }
}
