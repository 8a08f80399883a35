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
}
