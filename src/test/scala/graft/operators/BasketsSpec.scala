package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("pairCounts emits exactly the sorted C(n,2) pairs per basket") {
    val items = Seq(
      (1L, 30L), (1L, 10L), (1L, 20L), (1L, 10L), // dup item collapses
      (2L, 5L), (2L, 7L),
      (3L, 99L)) // singleton basket: no pairs
      .toDF("ok", "pk")
    val got = Baskets.pairCounts(Baskets.baskets(items, "ok", "pk"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 20L, 1L), (10L, 30L, 1L), (20L, 30L, 1L), (5L, 7L, 1L)))
  }

  test("pairCounts counts a pair once per basket it co-occurs in") {
    val items = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L)).toDF("ok", "pk")
    val got = Baskets.pairCounts(Baskets.baskets(items, "ok", "pk"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("a 1000-item mega-basket is dropped — pair output stays bounded") {
    // basket 1: 1000 distinct items (would emit C(1000,2) ≈ 500k pairs);
    // basket 2: a normal 3-item basket
    val mega = (1 to 1000).map(i => (1L, i.toLong))
    val small = Seq((2L, 1L), (2L, 2L), (2L, 3L))
    val items = (mega ++ small).toDF("ok", "pk")
    val capped = Baskets.baskets(items, "ok", "pk", maxItems = 64)
    assert(capped.select("ok").as[Long].collect().toSeq === Seq(2L))
    val pairs = Baskets.pairCounts(capped).as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("the dropped-basket count is observable on the job (no extra scan)") {
    val obsName = "graft.baskets_spec"
    val items = ((1 to 100).map(i => (1L, i.toLong)) ++ Seq((2L, 1L), (2L, 2L)))
      .toDF("ok", "pk")
    val capped = Baskets.baskets(items, "ok", "pk", maxItems = 64,
      metricName = obsName)
    // fish the metric out of the QueryExecution after an action
    var seen: Option[Long] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get(obsName).foreach(r => seen = Some(r.getLong(0)))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      capped.count()
      val deadline = System.nanoTime() + 5000000000L // listener bus is async
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      assert(seen === Some(1L), "mega-basket drop not observed")
    } finally spark.listenerManager.unregister(listener)
  }

  test("baskets rejects a cap that admits no pairs") {
    val items = Seq((1L, 1L)).toDF("ok", "pk")
    intercept[IllegalArgumentException] { Baskets.baskets(items, "ok", "pk", maxItems = 1) }
  }
}
