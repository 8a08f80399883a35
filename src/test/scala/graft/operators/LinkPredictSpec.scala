package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  // path graph 1-2-3 plus 2-4: common-neighbor pairs through z=2
  private def edges = Seq((1L, 2L), (2L, 3L), (2L, 4L))
    .toDF("a", "b")

  test("scores unlinked pairs through the shared middle, skips linked ones") {
    val out = LinkPredict.adamicAdar(edges, degCap = 64)
      .select($"u", $"v", $"n_common", $"aa_units")
      .as[(Long, Long, Long, Long)].collect().toSet
    // z=2 has degree 3 → each wedge contributes round(1e7/ln 3)
    val w = math.round(1e7 / math.log(3.0))
    assert(out === Set((1L, 3L, 1L, w), (1L, 4L, 1L, w), (3L, 4L, 1L, w)))
  }

  test("existing edges are never predicted") {
    val withEdge = edges.unionAll(Seq((1L, 3L)).toDF("a", "b"))
    val pairs = LinkPredict.adamicAdar(withEdge, degCap = 64)
      .select($"u", $"v").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((1L, 3L)))
  }

  test("degree cap removes hub middles from wedge generation") {
    // star: hub 100 connected to 1..5; plus 1-2 so deg(1)=deg(2)=2
    val star = (1L to 5L).map(n => (n, 100L)).toDF("a", "b")
      .unionAll(Seq((1L, 2L)).toDF("a", "b"))
    val capped = LinkPredict.adamicAdar(star, degCap = 4)
      .select($"u", $"v").as[(Long, Long)].collect().toSet
    // hub (deg 5) is over the cap: no pairs through it; the only other
    // middles are deg-2 nodes 1 and 2 → pairs (2,100)? no: adjacency of
    // z=1 is {100, 2} → pair (2, 100); z=2 → (1, 100); both EXIST? edges
    // are (1,100),(2,100),(1,2) so (2,100) and (1,100) are existing →
    // anti-joined away. Nothing survives.
    assert(capped.isEmpty)
    val uncapped = LinkPredict.adamicAdar(star, degCap = 64)
      .select($"u", $"v").as[(Long, Long)].collect().toSet
    // through the hub every leaf pair is predicted (minus existing 1-2)
    assert(uncapped === (for {
      u <- 1L to 5L; v <- 1L to 5L if u < v && !(u == 1L && v == 2L)
    } yield (u, v)).toSet)
  }

  test("score sum is integer arithmetic (LongType) on the 1e-7 grid") {
    val schema = LinkPredict.adamicAdar(edges, 64).schema
    assert(schema("aa_units").dataType === org.apache.spark.sql.types.LongType)
  }
}
