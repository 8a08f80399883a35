package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle enumeration (the compact-forward algorithm:
  * Latapy 2008). Orienting every edge from its lower-(degree, id)
  * endpoint to the higher one makes each triangle countable exactly
  * once AND bounds every node's out-degree by O(√m), so the wedge
  * self-join — the only superlinear step — generates O(m^1.5) rows
  * worst-case instead of Σdeg² (a hub of degree d contributes C(d,2)
  * wedges unoriented but only C(√m,2) oriented). All joins are shuffle
  * equi-joins on node keys; nothing is collected to the driver.
  */
object Triangles {

  /** @param edges undirected edges, columns (a, b); duplicates and
    *              self-loops tolerated (dropped)
    * @return      one row per triangle (a, b, c) in orientation order
    *
    * Node ids and degrees must fit in 31 bits — the (deg, id)
    * orientation key is packed into one long for a single-column
    * comparison; beyond that range, widen to a struct comparison.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val und = edges
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .where($"a" =!= $"b")
      .distinct()
    val deg = und.select($"a".as("n")).unionAll(und.select($"b".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
    val keyed = und
      .join(deg.select($"n".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"n".as("b"), $"deg".as("db")), "b")
      .select($"a", $"b",
        ($"da" * lit(1L << 32) + $"a").as("ka"),
        ($"db" * lit(1L << 32) + $"b").as("kb"))
    val oriented = keyed.select(
        when($"ka" < $"kb", $"a").otherwise($"b").as("src"),
        when($"ka" < $"kb", $"b").otherwise($"a").as("dst"),
        when($"ka" < $"kb", $"kb").otherwise($"ka").as("kdst"))
      // consumed three times (two wedge sides + the closing probe), so
      // materialize once — as an eager localCheckpoint, NOT cache():
      // the operator returns a lazy plan over this relation, so it can
      // never unpersist it itself, and a cache() entry stays pinned in
      // CacheManager for the session's lifetime (a leak per call in a
      // long-lived service). Checkpoint blocks are reference-tracked
      // and reclaimed by ContextCleaner once the result is dropped.
      // Two accepted costs of the eager form: (1) CONSTRUCTING the
      // triangles plan runs the orient+checkpoint job immediately, so
      // plan-only uses (explain, plan specs) pay it too; (2) checkpoint
      // blocks have no lineage — an executor loss mid-query fails the
      // query instead of recomputing (retry-level recovery, not
      // task-level). Both beat the session-lifetime cache leak.
      .localCheckpoint(true)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.kdst") < col("e2.kdst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    wedges.join(oriented.select($"src".as("b"), $"dst".as("c")), Seq("b", "c"))
      .select($"a", $"b", $"c")
  }
}
