package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration over an edge list — the standard
  * importance measure for crawl/link graphs (Page et al. 1999), here as
  * a pure DataFrame loop so Catalyst plans every step.
  *
  * Scale design:
  *  - the edge relation (with out-degree attached) is repartitioned by
  *    `src` ONCE and cached — every iteration's join reuses that layout,
  *    so the per-iteration cost is one shuffle of the (small, node-sized)
  *    rank relation, never of the edge relation;
  *  - ranks are `localCheckpoint`ed each round: lineage stays O(1) and
  *    the optimizer replans a 2-join tree per round instead of a
  *    2^k-join tree (the connected-components lesson — see
  *    `Dedup.connectedComponents`);
  *  - node count rides a broadcast 1-row aggregate instead of a
  *    driver-side `.count()`, keeping the whole operator lazy until the
  *    caller acts.
  *
  * Dangling nodes (out-degree 0) are not produced by symmetric graphs;
  * for directed input the caller symmetrizes or accepts rank leakage —
  * both standard formulations.
  */
object PageRank {

  /** @param edges  directed edges, columns (src, dst); duplicates count
    *               as parallel edges (weight = multiplicity)
    * @return       one row per node with out-edges: (node, pr)
    */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    // edge⋈degree, laid out by src for every iteration's rank join
    val contribs = edges.join(deg, "src")
      .select($"src", $"dst", $"deg")
      .repartition($"src")
      .cache()
    val nNodes = deg.agg(count(lit(1)).cast("double").as("n_nodes"))
    val nodes = deg.select($"src".as("node"))
      .join(broadcast(nNodes))
      .cache()

    var ranks = nodes.select($"node", (lit(1.0) / $"n_nodes").as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val inbound = contribs.join(ranks, contribs("src") === ranks("node"))
        .groupBy($"dst")
        .agg(sum($"pr" / $"deg").as("mass"))
      ranks = nodes
        .join(inbound, nodes("node") === inbound("dst"), "left")
        .select($"node",
          (lit(1.0 - damping) / $"n_nodes" +
            lit(damping) * coalesce($"mass", lit(0.0))).as("pr"))
        .localCheckpoint(true)
    }
    ranks
  }
}
