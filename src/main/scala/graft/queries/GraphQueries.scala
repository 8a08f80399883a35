package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.PageRank
import graft.sources.Tables

/** Graph analytics over the order graph (customer ↔ supplier via
  * lineitem) — the link-analysis face of the crawl engine: a crawler's
  * frontier IS a link graph, and ranking it (reference: the listing →
  * detail-page fan-out of `lianjia.py`) is PageRank's home turf.
  */
object GraphQueries {

  private val Damping = 0.85
  private val Iters = 8
  private val SinceDate = "1997-01-01"

  /** DuckDB twin: identical power iteration, unrolled one CTE per round
    * (DuckDB's recursive CTEs cannot re-aggregate per round). The
    * teleport constant is the Scala-computed double rendered exactly, so
    * both dialects iterate with bit-identical coefficients. */
  private def pagerankOracle(iters: Int, damping: Double): String = {
    val teleport = 1.0 - damping
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT d.src AS node, $teleport / nn.n + $damping * coalesce(m.mass, 0.0) AS pr
         |  FROM deg d CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst AS dst, sum(r.pr / d2.deg) AS mass
         |    FROM edges e JOIN r${k - 1} r ON r.node = e.src JOIN deg d2 ON d2.src = e.src
         |    GROUP BY e.dst) m ON m.dst = d.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE o_orderdate >= DATE '$SinceDate'),
       |edges AS (
       |  SELECT cn AS src, sn AS dst FROM pairs
       |  UNION ALL
       |  SELECT sn AS src, cn AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
       |r0 AS (SELECT d.src AS node, 1.0 / nn.n AS pr FROM deg d CROSS JOIN nn),
       |$rounds
       |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
       |            ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
       |  round(pr, 7) AS pr
       |FROM r$iters ORDER BY node""".stripMargin
  }

  /** PageRank over the symmetrized customer↔supplier purchase graph
    * (who-trades-with-whom importance), scoped to the recent-order
    * window. Symmetrizing removes dangling nodes, so rank mass is
    * conserved and the oracle needs no leakage term. The iteration runs
    * on parity-encoded LONG node ids (customer 2k, supplier 2k+1 — no
    * collisions at any key range); labels are stringified only at
    * output, so every shuffle of the loop moves 8-byte keys. All ~N
    * nodes are emitted — no top-k, so near-tie ordering noise can't
    * flake the row set. */
  val q76Pagerank = Q(
    "q76_pagerank",
    pagerankOracle(Iters, Damping)) { (spark, dir) =>
    val pairs = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(SinceDate).cast("date"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cn"), (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
      .cache()
    val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
      .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst")))
    val pr = PageRank.run(edges, Iters, Damping) // eager: computed here
    pairs.unpersist(false)
    pr.select(
        concat(when(col("node") % 2 === 0, "c").otherwise("s"),
          expr("node div 2").cast("string")).as("node"),
        round(col("pr"), 7).as("pr"))
      .orderBy(col("node"))
  }

  val all: Seq[Q] = Seq(q76Pagerank)
}
