package graft.sources

import org.apache.spark.sql.types.StructType
import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("sinks").toString

  test("K1 JSON feed sink round-trips") {
    val dir = tmp()
    val df = Seq((1L, "仁恒河滨城"), (2L, "翠湖天地")).toDF("id", "name")
    Sinks.writeJsonFeed(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() === 2)
    assert(back.orderBy("id").select("name").as[String].collect().toSeq
      === Seq("仁恒河滨城", "翠湖天地"))
  }

  test("K3 partitioned collection sink prunes on the partition column") {
    val dir = tmp()
    val df = Seq(("在售", 1L), ("成交", 2L), ("成交", 3L)).toDF("状态", "id")
    Sinks.writeCollection(df, dir, partitionBy = Seq("状态"))
    val sold = spark.read.parquet(dir).filter($"状态" === "成交")
    assert(sold.count() === 2)
    // partition pruning visible in the scan
    val plan = sold.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("CSV sink/source round-trips with explicit schema") {
    val dir = tmp()
    val df = Seq((1L, "a,b", 1.5), (2L, "plain", -0.25)).toDF("id", "s", "v")
    Sinks.writeCsv(df, dir)
    val back = Sinks.readCsv(spark, StructType.fromDDL("id BIGINT, s STRING, v DOUBLE"), dir)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("ORC sink/source round-trips and pushes filters") {
    val dir = tmp()
    val df = Seq((1L, "x"), (2L, "y"), (3L, "y")).toDF("id", "s")
    Sinks.writeOrc(df, dir)
    val q = Sinks.readOrc(spark, dir).filter($"id" > 1)
    assert(q.count() === 2)
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"))
  }

  test("bucketed tables join without an exchange") {
    val facts = (1L to 100L).map(i => (i % 10, i)).toDF("k", "v")
    val dims = (0L to 9L).map(i => (i, s"d$i")).toDF("k", "name")
    Sinks.writeBucketed(facts, "b_facts", nBuckets = 4, bucketCols = Seq("k"), sortCols = Seq("k"))
    Sinks.writeBucketed(dims, "b_dims", nBuckets = 4, bucketCols = Seq("k"), sortCols = Seq("k"))
    try {
      // disable broadcast so the join would shuffle if bucketing didn't align
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      assert(joined.count() === 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("S3 permissive read: malformed rows land in _corrupt_record, job survives") {
    val dir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.json"),
      """{"id": 1, "v": "ok"}
        |{"id": oops not json
        |{"id": 3, "v": "fine"}""".stripMargin)
    val schema = StructType.fromDDL("id BIGINT, v STRING")
    // Spark disallows querying ONLY _corrupt_record on a raw scan — cache
    // the parsed result first (the documented pattern)
    val got = Sinks.readJsonPermissive(spark, schema, dir).cache()
    assert(got.count() === 3)
    assert(got.filter("_corrupt_record is not null").count() === 1)
    assert(got.filter("id is not null").count() === 2)
  }
}
