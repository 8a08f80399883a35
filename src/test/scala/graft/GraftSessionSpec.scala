package graft

class GraftSessionSpec extends SparkSpec {

  test("registered SQL function graft_simhash64 matches the Column API") {
    GraftSession.registerFunctions(spark)
    import spark.implicits._
    val df = Seq("spark window join filter").toDF("text")
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql(
      "SELECT graft_simhash64(split(lower(text), '\\\\s+')) AS h FROM t")
      .as[Long].head()
    val viaCol = df.select(
      graft.functions.TextFns.simhash64(
        graft.functions.TextFns.tokens(org.apache.spark.sql.functions.col("text"))).as("h"))
      .as[Long].head()
    assert(viaSql === viaCol)
  }

  test("registerTables exposes the whole surface to pure SQL, custom exprs included") {
    GraftSession.registerFunctions(spark)
    GraftSession.registerTables(spark, "/root/testdata/sf0.001")
    // events routed through the nanos conversion: ts is a usable TIMESTAMP
    val hours = spark.sql(
      "SELECT count(DISTINCT date_trunc('hour', ts)) FROM events").head().getLong(0)
    assert(hours > 0)
    // custom expression over a registered table from SQL alone
    val sims = spark.sql(
      """SELECT graft_cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                        CAST(b.embedding AS ARRAY<DOUBLE>)) AS s
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |WHERE a.vec_id < 5""".stripMargin)
    assert(sims.count() === 5)
    assert(!sims.filter("s > 1.0000001 OR s < -1.0000001").take(1).nonEmpty)
  }
}
