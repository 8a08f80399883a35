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

  test("hashUniform lands in [0,1) and is deterministic") {
    val u = df.select(Sampling.hashUniform(col("id"))).as[Double].collect()
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    assert(math.abs(u.sum / u.length - 0.5) < 0.05) // ~uniform mean
  }

  test("weightedSampleKey: selection probability tracks the weight") {
    // one heavy item among 999 light ones: ln(u)/w → 0⁻ as w grows, so
    // the heavy item must rank first by key
    val weighted = (1L to 1000L).map(i => (i, if (i == 500L) 1e12 else 1.0))
      .toDF("id", "w")
    val top = weighted
      .select(col("id"), Sampling.weightedSampleKey(col("id"), col("w")).as("k"))
      .orderBy(col("k").desc).select("id").as[Long].head()
    assert(top === 500L)
    // and across equal weights, ranking is a deterministic permutation
    val k1 = df.select(Sampling.weightedSampleKey(col("id"), lit(1.0))).as[Double].collect()
    val k2 = df.select(Sampling.weightedSampleKey(col("id"), lit(1.0))).as[Double].collect()
    assert(k1.toSeq === k2.toSeq)
  }

  test("splitColumn labels every row into exactly one split") {
    val got = df.select(Sampling.splitColumn(col("id"),
        Seq(("train", 80), ("val", 90), ("test", 100))).as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.keySet === Set("train", "val", "test"))
    assert(got.values.sum === 1000L)
    assert(got("train") > got("val"))
  }

  test("assignShards: dense per-shard positions, deterministic under repartition") {
    val a = Sampling.assignShards(df, col("id"), 8)
      .select(col("id"), col("shard"), col("pos"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    // every shard in range; positions are exactly 1..count(shard)
    assert(a.forall { case (_, s, _) => s >= 0 && s < 8 })
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // shards are reasonably balanced (md5 uniformity; 1000 rows / 8)
    val sizes = a.groupBy(_._2).map(_._2.length)
    assert(sizes.min > 80 && sizes.max < 170)
    // identical assignment regardless of input partitioning — the
    // contract that makes rerun/retry/other-engine replays agree
    val b = Sampling.assignShards(df.repartition(17), col("id"), 8)
      .select(col("id"), col("shard"), col("pos"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // within-shard order is hash order: ingest-adjacent ids scatter
    val shard0 = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0.take(20).sliding(2).exists(p => p(1) < p(0)))
  }

  test("rendezvousShard: balanced, deterministic, minimal movement on reshard") {
    val s16 = df.select(col("id"), Sampling.rendezvousShard(col("id"), 16).as("s"))
      .as[(Long, Int)].collect().toMap
    assert(s16.values.forall(s => s >= 0 && s < 16))
    // md5-uniform balance over 1000 keys / 16 shards
    val sizes = s16.values.groupBy(identity).map(_._2.size)
    assert(sizes.min > 30 && sizes.max < 100)
    // deterministic under repartition
    val again = df.repartition(13)
      .select(col("id"), Sampling.rendezvousShard(col("id"), 16).as("s"))
      .as[(Long, Int)].collect().toMap
    assert(again === s16)
    // THE rendezvous property: growing 16 → 17 moves only the keys the
    // NEW shard wins — every moved key lands on shard 16, and the moved
    // fraction is ≈ 1/17 (allow 2×)
    val s17 = df.select(col("id"), Sampling.rendezvousShard(col("id"), 17).as("s"))
      .as[(Long, Int)].collect().toMap
    val moved = s16.keys.filter(k => s16(k) != s17(k)).toSeq
    assert(moved.nonEmpty && moved.forall(k => s17(k) == 16),
      "a key moved between OLD shards — mod-hash behavior, not rendezvous")
    assert(moved.size <= 2 * 1000 / 17, s"moved ${moved.size} of 1000")
  }
}
