package graft.operators

import graft.SparkSpec

/** Cohen's kappa against textbook fixtures — the check the q238 oracle
  * cannot provide (it replays the same fold). */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  private def kappa(rows: Seq[(String, String, String)]) =
    Agreement.cohenKappa(rows.toDF("g", "a", "b"), "g", "a", "b")
      .as[(String, Long, Long, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap

  test("the classic 2x2 textbook example: po=0.7, pe=0.58, kappa=2/7") {
    // Cohen's own worked shape: raters on 50 items — 20 yes/yes,
    // 15 no/no, 5 yes/no, 10 no/yes
    val rows =
      Seq.fill(20)(("g", "yes", "yes")) ++ Seq.fill(15)(("g", "no", "no")) ++
      Seq.fill(5)(("g", "yes", "no")) ++ Seq.fill(10)(("g", "no", "yes"))
    val r = kappa(rows)("g")
    assert(r._2 === 50L && r._3 === 35L)
    assert(r._4 === 0.7)
    // pe = (25*30 + 25*20)/2500 = 0.5
    assert(r._5 === 0.5)
    // kappa = (0.7 - 0.5)/(1 - 0.5) = 0.4
    assert(r._6 === Some(0.4))
  }

  test("perfect agreement gives kappa 1; constant raters give NULL") {
    val perfect = Seq(("p", "x", "x"), ("p", "y", "y"), ("p", "x", "x"))
    assert(kappa(perfect)("p")._6 === Some(1.0))
    // both raters constant: pe = 1, the correction is undefined
    val constant = Seq.fill(4)(("c", "x", "x"))
    assert(kappa(constant)("c")._6 === None)
  }

  test("independent raters sit near zero, disagreement goes negative") {
    // perfectly anti-correlated 2-class raters: po = 0, pe = 0.5 → -1
    val anti = Seq.fill(10)(("n", "x", "y")) ++ Seq.fill(10)(("n", "y", "x"))
    assert(kappa(anti)("n")._6 === Some(-1.0))
  }

  test("groups fold independently in one pass") {
    val rows = Seq(("g1", "x", "x"), ("g1", "y", "y"),
      ("g2", "x", "y"), ("g2", "y", "x"))
    val r = kappa(rows)
    assert(r("g1")._6 === Some(1.0))
    assert(r("g2")._6 === Some(-1.0))
  }
}
