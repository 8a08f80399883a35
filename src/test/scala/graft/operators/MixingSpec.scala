package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("waterfill: small sources saturate, the big one takes the exact remainder") {
    // total 1030, budget 3/5 → 618: 10 and 20 saturate (λ₁ = 206,
    // λ₂ = 304), the 1000-source drinks the remaining 588 — Σ = 618
    // lands the budget EXACTLY (integer arithmetic end to end)
    val a = Seq(("s1", 10L), ("s2", 20L), ("s3", 1000L)).toDF("source", "avail")
    val got = Mixing.waterfill(a, 3, 5)
      .select("source", "alloc", "saturated")
      .as[(String, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("s1") === ((10L, 1)))
    assert(got("s2") === ((20L, 1)))
    assert(got("s3") === ((588L, 0)))
  }

  test("waterfill: equal sources share equally, truncation gap < unsat count") {
    val a = Seq(("a", 100L), ("b", 100L), ("c", 100L)).toDF("source", "avail")
    // budget = 200: nobody saturates (λ = 66 < 100), each gets 200 div 3
    val got = Mixing.waterfill(a, 2, 3)
      .select("source", "alloc", "saturated")
      .as[(String, Long, Int)].collect()
    assert(got.forall(_._3 == 0))
    assert(got.map(_._2).distinct.toSeq === Seq(66L))
  }

  test("waterfill: full budget allocates everything, everyone saturates") {
    val a = Seq(("a", 5L), ("b", 50L)).toDF("source", "avail")
    val got = Mixing.waterfill(a, 1, 1)
      .select("source", "alloc", "saturated")
      .as[(String, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") === ((5L, 1)) && got("b") === ((50L, 1)))
  }

  test("a zero-availability source reports 0 epochs, not NaN") {
    val a = Seq(("empty", 0L), ("full", 100L)).toDF("source", "avail")
    val got = Mixing.waterfill(a, 1, 2)
      .select("source", "alloc", "epochs")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("empty") === ((0L, 0.0)))
    assert(got("full") === ((50L, 0.5)))
  }

  test("a rejected budget ratio fails fast") {
    val a = Seq(("a", 5L)).toDF("source", "avail")
    intercept[IllegalArgumentException] { Mixing.waterfill(a, 6, 5) }
  }
}
