package graft.sources

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("parquetDir catalog resolves testdata tables, events ts converted") {
    val c = Catalog.parquetDir("/root/testdata/sf0.001")
    assert(c.table(spark, "documents").count() > 0)
    assert(c.table(spark, "events").schema("ts").dataType.typeName === "timestamp")
  }

  test("session catalog resolves managed tables — the layout swap seam") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write
      .mode("overwrite").saveAsTable("cat_demo")
    try {
      // identical query code against either resolver
      def q(c: Catalog, name: String) = c.table(spark, name).count()
      assert(q(Catalog.session, "cat_demo") === 2)
    } finally spark.sql("DROP TABLE IF EXISTS cat_demo")
  }
}
