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

  private def q189FullCornerSum(): Long = {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val cs = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date"))
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).filter(col("c_nationkey") === 1),
        col("c_custkey") === col("o_custkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s")).distinct()
    val e = cs.as("x").join(cs.as("y"),
        col("x.c") === col("y.c") && col("x.s") < col("y.s"))
      .groupBy(col("x.s").as("a"), col("y.s").as("b"))
      .agg(count(lit(1)).as("shared")).filter(col("shared") >= 4)
      .select(col("a"), col("b"))
    graft.operators.Triangles.triangles(e).count() * 3
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
