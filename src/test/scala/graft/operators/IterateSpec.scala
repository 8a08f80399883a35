package graft.operators

import graft.SparkSpec

class IterateSpec extends SparkSpec {
  import spark.implicits._

  test("fixpoint traverses a link graph once per node, terminates on drain") {
    // page graph: a→b,c; b→d; c→d; d→a (cycle back)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val seed = Seq("a").toDF("url")
    val visited = Iterate.fixpoint(
      seed,
      frontier => frontier.join(edges, frontier("url") === edges("src"))
        .select(edges("dst").as("url")),
      keyCols = Seq("url"),
      maxIter = 10)
    assert(visited.orderBy("url").as[String].collect().toSeq === Seq("a", "b", "c", "d"))
  }

  test("fixpoint respects maxIter on an infinite chain") {
    // infinite chain: n → n+1
    val seed = Seq(0L).toDF("n")
    val visited = Iterate.fixpoint(
      seed,
      f => f.select(($"n" + 1).as("n")),
      keyCols = Seq("n"),
      maxIter = 3)
    assert(visited.count() === 4) // 0,1,2,3
  }

  // a graph with a cycle, a diamond (two same-length paths to d), an
  // unreachable island (x→y), and a node reachable at two different
  // depths via different paths (e: a→b→e at 2, a→c→d→e at 3)
  private val bfsEdges = Seq(
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"),
    ("b", "e"), ("d", "e"), ("x", "y"))

  test("bfsDepth: local (gated) ≡ distributed (gate disabled), depths exact") {
    val edges = bfsEdges.toDF("src", "dst")
    val seeds = Seq(("a", 0)).toDF("node", "depth")
    for (maxIter <- Seq(1, 2, 3, 10)) {
      val local = Iterate.bfsDepth(seeds, edges, maxIter)
        .orderBy("node").collect().toSeq
      val dist = Iterate.bfsDepth(seeds, edges, maxIter, localEdgeLimit = 0)
        .orderBy("node").collect().toSeq
      assert(local === dist, s"maxIter=$maxIter")
    }
    // exact depths at full expansion: e is 2 (via b), not 3 (via d)
    val full = Iterate.bfsDepth(seeds, edges, 10)
      .as[(String, Int)].collect().toMap
    assert(full === Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2, "e" -> 2))
  }

  test("bfsDepth: multi-source seeds, long node ids") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 3L)).toDF("src", "dst")
    val seeds = Seq((1L, 0), (10L, 0)).toDF("node", "depth")
    val local = Iterate.bfsDepth(seeds, edges, 5)
      .as[(Long, Int)].collect().toMap
    val dist = Iterate.bfsDepth(seeds, edges, 5, localEdgeLimit = 0)
      .as[(Long, Int)].collect().toMap
    assert(local === dist)
    assert(local === Map(1L -> 0, 10L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("relaxMin: local (gated) ≡ distributed (gate disabled), long costs") {
    // cheaper-but-longer path: a→d direct costs 10, a→b→c→d costs 3
    val edges = Seq(
      ("a", "d", 10L), ("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("d", "e", 5L), ("x", "y", 1L)).toDF("src", "dst", "w")
    val seeds = Seq(("a", 0L)).toDF("node", "cost")
    for (maxIter <- Seq(1, 2, 3, 10)) {
      val local = Iterate.relaxMin(seeds, edges, maxIter)
        .orderBy("node").collect().toSeq
      val dist = Iterate.relaxMin(seeds, edges, maxIter, localEdgeLimit = 0)
        .orderBy("node").collect().toSeq
      assert(local === dist, s"maxIter=$maxIter")
    }
    // bounded-hop semantics: at 1 round d costs 10; at 3 rounds, 3
    val r1 = Iterate.relaxMin(seeds, edges, 1).as[(String, Long)].collect().toMap
    assert(r1 === Map("a" -> 0L, "d" -> 10L, "b" -> 1L))
    val r3 = Iterate.relaxMin(seeds, edges, 3).as[(String, Long)].collect().toMap
    assert(r3 === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "e" -> 15L))
  }

  test("relaxMin: double costs and duplicate seeds min-merge") {
    val edges = Seq((1L, 2L, 0.5), (2L, 3L, 0.25)).toDF("src", "dst", "w")
    val seeds = Seq((1L, 5.0), (1L, 1.0), (3L, 0.0)).toDF("node", "cost")
    val local = Iterate.relaxMin(seeds, edges, 4)
      .as[(Long, Double)].collect().toMap
    val dist = Iterate.relaxMin(seeds, edges, 4, localEdgeLimit = 0)
      .as[(Long, Double)].collect().toMap
    assert(local === dist)
    assert(local === Map(1L -> 1.0, 2L -> 1.5, 3L -> 0.0))
  }
}
