package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf attaches latest strictly-prior payload per key") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 12:00:00"),
      (3L, 20L, "2024-01-01 09:00:00")
    ).toDF("event_id", "user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 09:30:00", 1.0),
      (10L, "2024-01-01 11:00:00", 2.0),
      (10L, "2024-01-01 13:00:00", 9.0),  // after both left rows — never used
      (20L, "2024-01-01 09:00:00", 5.0)   // equal ts — strictly-prior excludes
    ).toDF("user_id", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))

    val got = Joins.asOf(left, right, "user_id", "ts", Seq("value"))
      .orderBy("event_id").select("event_id", "asof_value")
      .as[(Long, Option[Double])].collect()
    assert(got.toSeq === Seq(
      (1L, Some(1.0)),   // latest prior of 09:30/11:00/13:00 before 10:00
      (2L, Some(2.0)),   // 11:00 wins before 12:00
      (3L, None)))       // equal-ts right row excluded (strict <)
  }

  test("asOf inclusive mode admits the equal-ts version (SCD2 effective-as-of)") {
    val left = Seq((1L, 10L, "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 09:00:00", 1.0),
      (10L, "2024-01-01 10:00:00", 2.0)   // starts AT the probe instant
    ).toDF("user_id", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val strict = Joins.asOf(left, right, "user_id", "ts", Seq("value"))
      .select("asof_value").as[Double].head()
    val incl = Joins.asOf(left, right, "user_id", "ts", Seq("value"), inclusive = true)
      .select("asof_value").as[Double].head()
    assert(strict === 1.0)
    assert(incl === 2.0)
  }

  test("asOfNext attaches earliest strictly-later payload per key") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 12:30:00"),
      (3L, 20L, "2024-01-01 09:00:00")
    ).toDF("event_id", "user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 09:30:00", 1.0),  // before both left rows — never used
      (10L, "2024-01-01 11:00:00", 2.0),
      (10L, "2024-01-01 13:00:00", 9.0),
      (20L, "2024-01-01 09:00:00", 5.0)   // equal ts — strictly-later excludes
    ).toDF("user_id", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))

    val got = Joins.asOfNext(left, right, "user_id", "ts", Seq("value"))
      .orderBy("event_id").select("event_id", "asofnext_value")
      .as[(Long, Option[Double])].collect()
    assert(got.toSeq === Seq(
      (1L, Some(2.0)),   // earliest following of 11:00/13:00 after 10:00
      (2L, Some(9.0)),   // 13:00 after 12:30
      (3L, None)))       // equal-ts right row excluded (strict >)
  }

  test("intervalOverlapJoin drops malformed intervals and rejects __cell inputs") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val a = Seq(
      (1L, d("2024-01-01"), d("2024-01-10")),
      (2L, d("2024-02-10"), d("2024-02-01"))) // end < start: malformed
      .toDF("a_id", "a_start", "a_end")
    val b = Seq((10L, d("2024-01-05"), d("2024-02-28")))
      .toDF("b_id", "b_start", "b_end")
    val got = Joins.intervalOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", bucketDays = 7)
      .select("a_id", "b_id", "overlap_days").as[(Long, Long, Int)].collect().toSeq
    // the malformed row is dropped (sequence() would otherwise emit a
    // DESCENDING cell list for it), the valid overlap survives
    assert(got === Seq((1L, 10L, 6)))
    val clash = a.withColumnRenamed("a_id", "__cell")
    val err = intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(clash, b,
        "a_start", "a_end", "b_start", "b_end", bucketDays = 7)
    }
    assert(err.getMessage.contains("__cell"))
  }

  test("asOf keeps left columns intact and drops right-only nulls") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"), 42.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val got = Joins.asOf(left, right, "user_id", "ts", Seq("value"))
    assert(got.columns.sorted.toSeq === Seq("asof_value", "event_id", "ts", "user_id", "value"))
    val row = got.select("value", "asof_value").as[(Double, Double)].head()
    assert(row === ((42.0, 7.0))) // left's own `value` survives the union trick
  }
}
