package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration over an edge list — the standard
  * importance measure for crawl/link graphs (Page et al. 1999), here as
  * a pure DataFrame loop so Catalyst plans every step.
  *
  * Scale design (the GraphX/Pregel adjacency shape, relationally):
  *  - edges are collapsed ONCE into a cached adjacency relation
  *    `(src, dsts: array, deg)` partitioned by `src`; each iteration
  *    joins it with the node-sized rank relation and explodes the
  *    neighbor arrays NARROWLY — the per-round shuffle is rank-sized
  *    (nodes), never edge-sized, and the big relation is never re-sorted
  *    (the naive edge⋈rank join pays a 10⁶-row sort-merge every round);
  *  - hub skew is bounded: a node whose degree exceeds `maxFanout` has
  *    its adjacency list salted across ceil(deg/maxFanout) rows, so no
  *    single row (or task) owns a whole celebrity node;
  *  - ranks are `localCheckpoint`ed each round: lineage stays O(1) and
  *    the optimizer replans a 2-join tree per round instead of a
  *    2^k-join tree (the connected-components lesson — see
  *    `Dedup.connectedComponents`);
  *  - node count rides a broadcast 1-row aggregate instead of a
  *    driver-side `.count()`.
  *
  * Dangling nodes (out-degree 0) are not produced by symmetric graphs;
  * for directed input the caller symmetrizes or accepts rank leakage —
  * both standard formulations.
  */
object PageRank {

  /** @param edges     directed edges, columns (src, dst); duplicates
    *                   count as parallel edges (weight = multiplicity)
    * @param maxFanout  max neighbors per adjacency row (hub salting)
    * @return           one row per node with out-edges: (node, pr)
    */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85,
          maxFanout: Int = 1 << 16, checkpointEvery: Int = 2): DataFrame = {
    import edges.sparkSession.implicits._
    loop(edges, iterations, damping, maxFanout, checkpointEvery,
      init = lit(1.0) / $"n_nodes",
      teleport = lit(1.0 - damping) / $"n_nodes")
  }

  /** Personalized PageRank: the teleport mass restarts at `seeds`
    * instead of everywhere, so ranks measure proximity to the seed set
    * (the "related items / similar users" graph feature). Identical
    * one-adjacency-join-per-round plan; only the two rank expressions
    * differ. */
  def runPersonalized(edges: DataFrame, iterations: Int, seeds: Seq[Long],
      damping: Double = 0.85, maxFanout: Int = 1 << 16,
      checkpointEvery: Int = 2): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs a seed set")
    import edges.sparkSession.implicits._
    val seedMass = 1.0 / seeds.size
    loop(edges, iterations, damping, maxFanout, checkpointEvery,
      init = when($"node".isin(seeds: _*), lit(seedMass)).otherwise(lit(0.0)),
      teleport = when($"node".isin(seeds: _*), lit((1.0 - damping) * seedMass))
        .otherwise(lit(0.0)))
  }

  /** Shared power-iteration loop. `init` and `teleport` are expressions
    * over the node relation's columns (`node`, `n_nodes`); uniform
    * values give classic PageRank, seed-indicator values give the
    * personalized variant. */
  private def loop(edges: DataFrame, iterations: Int, damping: Double,
      maxFanout: Int, checkpointEvery: Int,
      init: org.apache.spark.sql.Column,
      teleport: org.apache.spark.sql.Column): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, "src")
      .withColumn("salt",
        pmod(hash($"dst"), greatest(ceil($"deg" / maxFanout), lit(1))).cast("int"))
      .groupBy($"src", $"salt")
      .agg(collect_list($"dst").as("dsts"), first($"deg").as("deg"))
      .drop("salt")
      .repartition($"src") // the layout every iteration's rank join reuses
      .cache()
    val nNodes = adj.select($"src").distinct()
      .agg(count(lit(1)).cast("double").as("n_nodes"))
    val nodes = adj.select($"src".as("node")).distinct()
      .join(broadcast(nNodes))
      .cache()

    var ranks = nodes.select($"node", init.as("pr"))
      .localCheckpoint(true)
    for (i <- 1 to iterations) {
      val inbound = adj.join(ranks, adj("src") === ranks("node"))
        .select(explode($"dsts").as("dst"), ($"pr" / $"deg").as("w"))
        .groupBy($"dst")
        .agg(sum($"w").as("mass"))
      ranks = nodes
        .join(inbound, nodes("node") === inbound("dst"), "left")
        .select($"node",
          (teleport + lit(damping) * coalesce($"mass", lit(0.0))).as("pr"))
      // checkpoint every `checkpointEvery` rounds (and the last):
      // lineage stays bounded (≤ a checkpointEvery-round plan tree)
      // while paying a fraction of the eager materializations —
      // per-round checkpointing dominated the wall-clock of small-graph
      // runs
      if (i % checkpointEvery == 0 || i == iterations)
        ranks = ranks.localCheckpoint(true)
    }
    // the eager checkpoints above fully materialized the result, so the
    // working caches can be released before handing the ranks back
    adj.unpersist(false)
    nodes.unpersist(false)
    ranks
  }
}
