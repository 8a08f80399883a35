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
}
