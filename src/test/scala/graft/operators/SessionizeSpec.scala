package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Seq(
    (1L, 100L, "2024-01-01 10:00:00"),
    (2L, 100L, "2024-01-01 10:10:00"),  // same session (gap 10m < 30m)
    (3L, 100L, "2024-01-01 10:40:00"),  // still same session (gap EXACTLY 30m merges)
    (4L, 100L, "2024-01-01 11:10:01"),  // NEW session (gap 30m01s > 30m)
    (5L, 200L, "2024-01-01 00:00:00")   // separate user
  ).toDF("event_id", "user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))

  test("tagSessions merges at gap == threshold, splits strictly above") {
    val got = Sessionize.tagSessions(events, "user_id", "ts", "event_id", 1800L)
      .orderBy("event_id").select("event_id", "session_id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 1L)))
  }

  test("sessionWindows (built-in) agrees with tagSessions on session counts") {
    val viaBuiltin = Sessionize.sessionWindows(events, col("user_id"), col("ts"), "30 minutes")
      .groupBy("user_id").agg(count(lit(1)).as("n")).orderBy("user_id")
      .as[(Long, Long)].collect()
    val viaTags = Sessionize.tagSessions(events, "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id").agg(max("session_id").as("n")).orderBy("user_id")
      .as[(Long, Long)].collect()
    assert(viaBuiltin.toSeq === viaTags.toSeq)
    assert(viaBuiltin.toSeq === Seq((100L, 2L), (200L, 1L)))
  }
}
