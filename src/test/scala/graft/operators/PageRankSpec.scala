package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int = 20): Map[String, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("rank mass is conserved (sums to 1) on a symmetric graph") {
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a", "a" -> "c")
    val sym = pairs ++ pairs.map(_.swap)
    val r = ranks(sym)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("every node of a cycle gets the uniform rank") {
    val cycle = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val r = ranks(cycle)
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-9))
  }

  test("the hub of a symmetric star outranks the spokes") {
    val spokes = (1 to 6).map(i => "hub" -> s"s$i")
    val r = ranks(spokes ++ spokes.map(_.swap))
    assert(r("hub") > r("s1") * 3)
    (1 to 6).foreach(i => assert(math.abs(r(s"s$i") - r("s1")) < 1e-12))
  }

  test("parallel edges weight the walk") {
    // b is reachable twice from a; c once — b must outrank c
    val edges = Seq("a" -> "b", "a" -> "b", "a" -> "c",
      "b" -> "a", "b" -> "a", "c" -> "a")
    val r = ranks(edges)
    assert(r("b") > r("c"))
  }

  test("iteration converges at the damping rate") {
    // consecutive-round delta contracts by the damping factor, so the
    // bound after k rounds is O(0.85^k): ~2.6e-5 headroom at k=20
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "d" -> "a")
    val sym = pairs ++ pairs.map(_.swap)
    val r19 = ranks(sym, 19)
    val r20 = ranks(sym, 20)
    val r21 = ranks(sym, 21)
    val d20 = r20.keys.map(k => math.abs(r20(k) - r21(k))).max
    val d19 = r19.keys.map(k => math.abs(r19(k) - r20(k))).max
    assert(d20 < 1e-4)
    assert(d20 < 0.9 * d19)
  }
}
