package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish stream: token_i appears 2^(10-i) times, plus 200 singletons
  private lazy val tokens: Seq[String] =
    (0 to 9).flatMap(i => Seq.fill(1 << (10 - i))(s"hot$i")) ++
      (0 until 200).map(i => s"rare$i")

  test("Misra-Gries keeps every item with count > N/k, estimates undercount ≤ N/k") {
    val k = 16
    val n = tokens.length.toLong
    val df = tokens.toDF("t").repartition(4) // force partial buffers + merge
    val got = df.agg(FreqSketch.heavyHitters(col("t"), k).as("hh"))
      .as[Map[String, Long]].head()
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / k
    // guarantee 1: all true heavy hitters survive
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(got.contains(t), s"heavy hitter $t (count ${exact(t)}) evicted")
    }
    // guarantee 2: estimates never exceed the true count, undercount ≤ N/k
    got.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
      assert(est >= exact(t) - bound, s"$t undercounted beyond N/k")
    }
    // bounded memory: never more than k counters
    assert(got.size <= k)
  }

  test("grouped heavy hitters: per-group sketches stay independent") {
    val df = (tokens.map(("a", _)) ++ Seq.fill(100)(("b", "only"))).toDF("g", "t")
      .repartition(4)
    val got = df.groupBy("g").agg(FreqSketch.heavyHitters(col("t"), 8).as("hh"))
      .as[(String, Map[String, Long])].collect().toMap
    assert(got("b") === Map("only" -> 100L))
    assert(got("a").contains("hot0"))
  }
}
