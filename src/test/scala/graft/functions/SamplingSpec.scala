package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 1000L).toDF("id")

  test("hashSample is deterministic and roughly proportional") {
    val a = Sampling.hashSample(df, col("id"), 10).as[Long].collect().toSet
    val b = Sampling.hashSample(df, col("id"), 10).as[Long].collect().toSet
    assert(a === b)
    assert(a.size > 50 && a.size < 200, s"10% of 1000 ids selected ${a.size}")
    // monotone: a 20% sample contains the 10% sample (bucket < pct nests)
    val wider = Sampling.hashSample(df, col("id"), 20).as[Long].collect().toSet
    assert(a.subsetOf(wider))
  }

  test("splitColumn labels every row into exactly one split") {
    val got = df.select(Sampling.splitColumn(col("id"),
        Seq(("train", 80), ("val", 90), ("test", 100))).as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.keySet === Set("train", "val", "test"))
    assert(got.values.sum === 1000L)
    assert(got("train") > got("val"))
  }
}
