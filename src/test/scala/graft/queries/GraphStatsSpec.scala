package graft.queries

import graft.SparkSpec

/** Invariant checks for the node-grain graph statistics (q189 local
  * clustering, q190 assortativity) against their own graph's global
  * counts (q80 census) — the three queries share one graph construction,
  * so their aggregate identities must agree exactly.
  */
class GraphStatsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("q189 lcc in [0,1]; triangle corners sum to 3x the q80 census") {
    val rows = q("q189").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, nTri, lcc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(lcc >= 0.0 && lcc <= 1.0, s"supplier ${r.get(0)}: lcc $lcc")
      // a node's triangles can't exceed its wedge count
      assert(nTri <= deg * (deg - 1) / 2, s"supplier ${r.get(0)}")
    }
    // full-graph identity (not just top-20): recompute per-node sums
    import org.apache.spark.sql.functions._
    val censusTri = GraphQueries.q80TriangleCensus.run(spark, sfDir)
      .select(col("n_triangles")).head().getLong(0)
    // every triangle has exactly 3 corners → Σ_node n_tri = 3·triangles;
    // the top-20 projection can't verify that, so rebuild the corner sum
    val full = q189FullCornerSum()
    assert(full === 3 * censusTri, s"corner sum $full vs 3x$censusTri")
  }

  private def q189FullCornerSum(): Long =
    graft.operators.Triangles.triangles(
      GraphQueries.coPurchaseEdges(spark, sfDir)).count() * 3

  test("a planted 1000-supplier mega-customer is dropped from the edge build") {
    import spark.implicits._
    // customers 2-5 each buy suppliers 10 and 20 → edge (10,20) with 4
    // shared customers, exactly at the threshold. The mega-customer 1
    // buys 1000 suppliers including 10 and 20 — uncapped it would lift
    // (10,20) to 5 shared AND emit C(1000,2) ≈ 500k pair rows; the
    // capped build must drop it (observed) and leave the edge at 4.
    val mega = (1 to 1000).map(i => (1L, i.toLong))
    val normal = (2L to 5L).flatMap(c => Seq((c, 10L), (c, 20L)))
    val cs = (mega ++ normal).toDF("c", "s")
    var dropped: Option[Long] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("graft.copurchase")
          .foreach(r => dropped = Some(r.getLong(0)))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val edges = GraphQueries.coPurchaseEdges(cs)
        .as[(Long, Long)].collect().toSet
      assert(edges === Set((10L, 20L)),
        "mega-customer pairs leaked into the edge list")
      val deadline = System.nanoTime() + 5000000000L // listener bus is async
      while (dropped.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      assert(dropped === Some(1L), "mega-basket drop not observed")
    } finally spark.listenerManager.unregister(listener)
  }

  test("q190 assortativity is a correlation: r in [-1, 1]") {
    val r = q("q190").head()
    val a = r.getDouble(2)
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"assortativity $a")
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
  }

  private def q(prefix: String) =
    graft.SparkEntry.queries.collectFirst {
      case (name, fn) if name.startsWith(prefix) => fn(spark, sfDir)
    }.get
}
