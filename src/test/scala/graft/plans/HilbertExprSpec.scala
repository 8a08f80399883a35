package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertExprSpec extends SparkSpec {
  import spark.implicits._

  test("index is a bijection on the full grid with the neighbor property") {
    val n = 1 << HilbertExpr.Bits
    val pos = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = HilbertExpr.index(x, y)
      assert(d >= 0 && d < n.toLong * n)
      assert(pos(d.toInt) == null, s"collision at d=$d")
      pos(d.toInt) = (x, y)
    }
    // consecutive curve positions are always grid neighbors — the
    // locality property Morton interleaving lacks
    (0 until n * n - 1).foreach { i =>
      val ((x1, y1), (x2, y2)) = (pos(i), pos(i + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1, s"seam at $i")
    }
  }

  test("column API matches the Scala kernel and handles nulls") {
    val df = Seq((Some(3L), Some(5L)), (None, Some(1L)), (Some(250L), Some(250L)))
      .toDF("x", "y")
    val got = df.select(HilbertExpr.hilbertIndex($"x", $"y").as("d"))
      .as[Option[Long]].collect()
    assert(got(0) === Some(HilbertExpr.index(3, 5)))
    assert(got(1) === None)
    assert(got(2) === Some(HilbertExpr.index(250, 250)))
  }

  test("inputs are masked to the grid, integer types all accepted") {
    val d = Seq((int2Integer(3), 5L)).toDF("x", "y")
      .select(HilbertExpr.hilbertIndex($"x", $"y").as("d"))
      .as[Long].head()
    assert(d === HilbertExpr.index(3, 5))
    assert(HilbertExpr.index(256 + 3, 512 + 5) === HilbertExpr.index(3, 5))
  }

  test("expression stays inside whole-stage codegen") {
    val plan = spark.range(16)
      .select(HilbertExpr.hilbertIndex($"id", $"id" + 1).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators in the
    // compact plan string; the Project carrying the expression must be
    // inside one (no fallback to interpreted eval)
    assert(plan.contains("*(1) Project [graft_hilbert_index"))
  }
}
