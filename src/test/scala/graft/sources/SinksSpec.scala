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
