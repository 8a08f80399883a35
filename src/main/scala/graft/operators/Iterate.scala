package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The whole-crawl fixpoint (SURVEY §2.3 G9): the reference's Scrapy
  * scheduler loop — frontier → expand → dedup against visited → repeat —
  * as a driver-side loop of DataFrame ops.
  *
  * Scale notes:
  *  - `visited` dedup is a `left_anti` join (shuffle on the key), the
  *    distributed form of the RFPDupeFilter fingerprint set;
  *  - `localCheckpoint` truncates lineage each round — without it the
  *    plan tree grows linearly with iterations and planning time blows
  *    up long before data size matters;
  *  - `maxIter` bounds the loop (SURVEY §7.4 watch-list).
  */
object Iterate {

  /** Iterate `step` from `seed` until the frontier drains or `maxIter`.
    *
    * @param seed    initial frontier
    * @param step    frontier → newly generated candidate rows
    * @param keyCols identity columns for visited-set dedup
    * @return all rows ever visited (seed ∪ every accepted frontier)
    */
  def fixpoint(seed: DataFrame, step: DataFrame => DataFrame,
      keyCols: Seq[String], maxIter: Int): DataFrame = {
    var visited = seed.dropDuplicates(keyCols).localCheckpoint()
    var frontier = visited
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      val next = step(frontier)
        .dropDuplicates(keyCols)
        .join(visited, keyCols, "left_anti")
        .localCheckpoint() // cut lineage; also breaks the self-reference
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next
      i += 1
    }
    visited
  }

  /** Bounded-round MIN-VALUE relaxation (Bellman-Ford / delta-stepping
    * family): the VALUE-refining sibling of [[fixpoint]]. `fixpoint`'s
    * visited anti-join is right when a node, once reached, is final
    * (unit-weight BFS); with weighted edges a later path can be CHEAPER,
    * so the state per node is a value to be min-merged, not a visited
    * bit.
    *
    * Per round: candidates = frontier ⋈ edges (cost + w), min-combined
    * per node map-side BEFORE the merge; dist' = min(dist, candidates);
    * the next frontier is only the STRICTLY IMPROVED nodes (delta
    * iteration — relaxing an unimproved node reproduces candidates that
    * already lost a min, so dropping them changes nothing but the work).
    * Terminates early when a round improves nothing.
    *
    * Scale: each round shuffles candidate rows (edge fan-out of the
    * improved set, pre-combined) + the dist merge on node — the same
    * per-round shape as PageRank's edge-form rounds; `localCheckpoint`
    * cuts the growing lineage exactly as in [[fixpoint]].
    *
    * @param seed  (node, cost) initial distances (need not be distinct)
    * @param edges (src, dst, w) directed weighted edges; w ≥ 0
    * @return (node, cost) minimum cost within `maxIter` hops of any seed
    */
  def relaxMin(seed: DataFrame, edges: DataFrame, maxIter: Int): DataFrame = {
    var dist = seed.groupBy("node").agg(min("cost").as("cost")).localCheckpoint()
    var frontier = dist
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      val cand = edges.join(frontier, edges("src") === frontier("node"))
        .select(edges("dst").as("node"), (frontier("cost") + edges("w")).as("cost"))
        .groupBy("node").agg(min("cost").as("cost"))
      val merged = dist.unionByName(cand)
        .groupBy("node").agg(min("cost").as("cost"))
        .localCheckpoint()
      frontier = cand
        .join(dist.withColumnRenamed("cost", "__old"), Seq("node"), "left")
        .filter(col("__old").isNull || col("cost") < col("__old"))
        .select("node", "cost")
        .localCheckpoint()
      dist = merged
      i += 1
    }
    dist
  }
}
