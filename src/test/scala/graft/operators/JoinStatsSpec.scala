package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinStatsSpec extends SparkSpec {
  import spark.implicits._

  test("equiJoinForecast total equals the actual join's row count") {
    val left = Seq(1, 1, 1, 2, 2, 3, 7).toDF("lk")
    val right = Seq(1, 2, 2, 2, 3, 3, 9).toDF("rk")
    val forecast = JoinStats.equiJoinForecast(left, right, "lk", "rk")
    val predicted = forecast.agg(sum($"out_rows")).as[Long].head()
    val actual = left.join(right, $"lk" === $"rk").count()
    assert(predicted === actual)
    // keys absent from either side never appear
    val keys = forecast.select($"key").as[Int].collect().toSet
    assert(keys === Set(1, 2, 3))
  }

  test("selfJoinPairForecast total equals the actual unordered pair count") {
    val df = Seq("a", "a", "a", "a", "b", "b", "c").toDF("k")
    val forecast = JoinStats.selfJoinPairForecast(df, "k")
    val predicted = forecast.agg(sum($"pairs")).as[Long].head()
    val ids = df.withColumn("id", monotonically_increasing_id())
    val actual = ids.as("x").join(ids.as("y"),
      col("x.k") === col("y.k") && col("x.id") < col("y.id")).count()
    assert(predicted === actual) // 4C2 + 2C2 + 0 = 7
    assert(predicted === 7L)
  }

  test("hotKeys ranks by weight, carries total and exact percent share") {
    val forecast = Seq(("a", 6L), ("b", 3L), ("c", 1L))
      .toDF("key", "pairs").withColumn("n_rows", lit(0L))
    val hot = JoinStats.hotKeys(forecast, "pairs", 2)
      .orderBy($"pairs".desc)
      .select($"key", $"pairs", $"total", $"pct_of_total")
      .as[(String, Long, Long, Double)].collect()
    assert(hot.toSeq === Seq(("a", 6L, 10L, 60.0), ("b", 3L, 10L, 30.0)))
  }

  test("pair forecast stays exact past double precision (DIV, not /)") {
    // 2^27+1 rows of one key would overflow a double-rounded division's
    // exactness guarantee at larger c; check the expression uses integer
    // DIV by feeding a count whose c(c-1)/2 is not representable issues:
    // here we just pin the type — LongType, not DoubleType.
    val forecast = JoinStats.selfJoinPairForecast(Seq("x", "x").toDF("k"), "k")
    assert(forecast.schema("pairs").dataType ===
      org.apache.spark.sql.types.LongType)
  }
}
