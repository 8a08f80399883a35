package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "v")
  private lazy val dim = (1L to 1000L).filter(_ % 13 == 0).map(i => (i, "d")).toDF("dk", "tag")

  test("bloom semi-join equals the plain semi-join exactly") {
    val got = BloomJoin.bloomSemiJoin(fact, dim, "k", "dk")
      .select("k").as[Long].collect().sorted
    val want = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("k").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq && got.nonEmpty)
  }

  test("fact rows with no dim match never survive, even at tiny filter width") {
    // 64 bits for 76 keys: false positives guaranteed; result still exact
    val got = BloomJoin.bloomSemiJoin(fact, dim, "k", "dk",
      expectedItems = 8, numBits = 64)
      .select("k").as[Long].collect()
    assert(got.forall(_ % 13 == 0))
  }

  test("null fact keys are dropped, matching semi-join semantics") {
    val withNull = fact.unionAll(Seq((Option.empty[Long], 0L)).toDF("k", "v"))
    val got = BloomJoin.bloomSemiJoin(withNull, dim, "k", "dk")
    assert(got.filter($"k".isNull).count() === 0)
  }
}
