package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class ParetoSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force O(n²) reference: undominated under
    * (t_j < t_i ∧ s_j ≥ s_i) ∨ (t_j = t_i ∧ s_j > s_i). */
  private def reference(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filterNot { case (id, t, s) =>
      pts.exists { case (_, tj, sj) =>
        (tj < t && sj >= s) || (tj == t && sj > s)
      }
    }.map(_._1).toSet

  test("matches the brute-force frontier on random point sets") {
    val rnd = new Random(42)
    (1 to 3).foreach { trial =>
      val pts = (1L to 200L).map(id =>
        (id, rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
      val got = Pareto.frontier2d(
        pts.toDF("id", "t_cost", "s_score"), "t_cost", "s_score")
        .select($"id").as[Long].collect().toSet
      assert(got === reference(pts), s"trial $trial")
    }
  }

  test("ties on (t, s) all stay on the frontier") {
    val pts = Seq((1L, 5L, 10L), (2L, 5L, 10L), (3L, 7L, 10L), (4L, 3L, 4L))
      .toDF("id", "t_cost", "s_score")
    val got = Pareto.frontier2d(pts, "t_cost", "s_score")
      .select($"id").as[Long].collect().toSet
    // 3 is dominated (more cost, same score); 1 and 2 tie; 4 is the
    // cheap low-score corner
    assert(got === Set(1L, 2L, 4L))
  }

  test("single-cost degenerate input keeps only the max score rows") {
    val pts = Seq((1L, 9L, 1L), (2L, 9L, 8L), (3L, 9L, 8L))
      .toDF("id", "t_cost", "s_score")
    val got = Pareto.frontier2d(pts, "t_cost", "s_score")
      .select($"id").as[Long].collect().toSet
    assert(got === Set(2L, 3L))
  }

  test("bucket count does not change the result") {
    val rnd = new Random(7)
    val pts = (1L to 300L).map(id =>
      (id, rnd.nextInt(1000).toLong, rnd.nextInt(100).toLong))
    val df = pts.toDF("id", "t_cost", "s_score")
    val b4 = Pareto.frontier2d(df, "t_cost", "s_score", buckets = 4)
      .select($"id").as[Long].collect().toSet
    val b64 = Pareto.frontier2d(df, "t_cost", "s_score", buckets = 64)
      .select($"id").as[Long].collect().toSet
    assert(b4 === b64)
    assert(b4 === reference(pts))
  }
}
