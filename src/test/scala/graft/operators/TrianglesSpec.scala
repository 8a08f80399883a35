package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Long =
    Triangles.triangles(edges.toDF("a", "b")).count()

  test("one triangle, counted once regardless of edge direction/duplication") {
    val e = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 1L -> 2L)
    assert(count(e) === 1)
  }

  test("K4 has 4 triangles") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val e = for (a <- nodes; b <- nodes if a < b) yield a -> b
    assert(count(e) === 4)
  }

  test("stars and paths have none; self-loops ignored") {
    assert(count(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 1L)) === 0)
    assert(count(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)) === 0)
  }

  test("two triangles sharing an edge") {
    assert(count(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 2L -> 4L, 3L -> 4L)) === 2)
  }
}
