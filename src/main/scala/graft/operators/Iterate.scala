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
}
