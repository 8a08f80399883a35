package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a Zipf-skewed key") {
    // hot key 1 carries 80% of rows
    val left = (1 to 500).map(i => (if (i <= 400) 1L else i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 120).map(i => (i.toLong, s"r$i")).toDF("k", "rv")

    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewJoin.saltedJoin(left, right, "k", saltFactor = 8)
      .select("k", "lv", "rv").collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
  }

  test("explicit saltCols: same rows as plain join, hot key actually spreads") {
    val left = (1 to 500).map(i => (if (i <= 400) 1L else i.toLong, i, s"l$i"))
      .toDF("k", "id", "lv")
    val right = (1 to 120).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewJoin.saltedJoin(left, right, "k", saltFactor = 8,
        saltCols = Seq("id"))
      .select("k", "lv", "rv").collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
    // the hot key's 400 rows must land in several salt buckets
    import org.apache.spark.sql.functions._
    val buckets = left.filter($"k" === 1L)
      .select(pmod(xxhash64(struct(col("id"))), lit(8)).cast("int").as("s"))
      .distinct().count()
    assert(buckets >= 4, s"only $buckets salt buckets used for the hot key")
  }

  test("saltedJoin left join keeps unmatched rows exactly once") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val got = SkewJoin.saltedJoin(left, right, "k", 4, "left")
    assert(got.count() === 3)
    assert(got.filter("rv is null").count() === 1)
  }

  // the gate leaves "__salt" in the analyzed plan only on the salted path
  private def tookSaltedPath(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.toString.contains("__salt")

  test("saltedJoinIfSkewed salts a measurably hot key — and matches the plain join") {
    // hot key 1 carries 80% of rows: far over 2× the fair share of any
    // post-shuffle partition
    val left = (1 to 500).map(i => (if (i <= 400) 1L else i.toLong, i, s"l$i"))
      .toDF("k", "id", "lv")
    val right = (1 to 120).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val gated = SkewJoin.saltedJoinIfSkewed(left, right, "k", saltFactor = 8,
      saltCols = Seq("id"))
    assert(tookSaltedPath(gated), "hot key did not trigger the salted path")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toString).sorted.toSeq
    assert(gated.select("k", "lv", "rv").collect().map(_.toString).sorted.toSeq === plain)
  }

  test("saltedJoinIfSkewed degrades to the plain join when no key is hot") {
    // uniform: every key appears once — salting would pay 8× right-side
    // replication for nothing
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 120).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val gated = SkewJoin.saltedJoinIfSkewed(left, right, "k", saltFactor = 8)
    assert(!tookSaltedPath(gated), "unskewed input still salted")
    val plain = left.join(right, Seq("k")).collect().map(_.toString).sorted.toSeq
    assert(gated.collect().map(_.toString).sorted.toSeq === plain)
  }

  test("saltedJoinIfSkewed minHotRows floor keeps tiny skewed inputs unsalted") {
    // 9 of 12 rows share a key — over the ratio bar, under the floor
    val left = ((1 to 9).map(_ => (1L, "h")) ++ Seq((2L, "a"), (3L, "b"), (4L, "c")))
      .toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val gated = SkewJoin.saltedJoinIfSkewed(left, right, "k", saltFactor = 8,
      minHotRows = 1000L)
    assert(!tookSaltedPath(gated), "input under the absolute floor still salted")
    assert(gated.count() === 10)
  }

  test("saltedJoinIfSkewed handles an empty left side") {
    val left = Seq.empty[(Long, String)].toDF("k", "lv")
    val right = Seq((1L, "x")).toDF("k", "rv")
    assert(SkewJoin.saltedJoinIfSkewed(left, right, "k", 8).count() === 0)
  }
}
