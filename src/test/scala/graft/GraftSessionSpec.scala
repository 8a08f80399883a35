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
}
