package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = {
    // ties on score force the id tiebreaker; multiple groups
    val r = new scala.util.Random(7)
    (1 to 500).map(i => (s"g${i % 5}", (r.nextInt(50) / 10.0), i.toLong))
  }.toDF("g", "s", "id")

  test("aggregator equals the row_number window formulation exactly") {
    val viaAgg = rows.groupBy("g")
      .agg(TopK.topK(col("s"), col("id"), 7).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("idx", "t")))
      .select(col("g"), (col("idx") + 1).as("rk"), col("t.s"), col("t.i"))
      .collect().map(_.toString).sorted.toSeq
    val viaWindow = rows
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("id"))))
      .filter(col("rk") <= 7)
      .select(col("g"), col("rk").cast("int"), col("s"), col("id"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaAgg === viaWindow)
  }

  test("reduce fast-path and merge keep the k best regardless of arrival order") {
    val a = TopK.topKAgg(3)
    val xs = Seq(5.0 -> 1L, 1.0 -> 2L, 5.0 -> 0L, 9.0 -> 9L, 2.0 -> 4L)
    def bufOf(s: Seq[(Double, Long)]) =
      s.foldLeft(a.zero)((b, x) => a.reduce(b, TopK.SI(x._1, x._2)))
    val expected = Seq(TopK.SI(9.0, 9L), TopK.SI(5.0, 0L), TopK.SI(5.0, 1L))
    assert(bufOf(xs) === expected)
    assert(bufOf(xs.reverse) === expected)
    val (l, r) = xs.splitAt(2)
    assert(a.merge(bufOf(l), bufOf(r)) === expected)
  }

  test("groups smaller than k return their full membership") {
    val small = Seq(("g", 1.0, 1L), ("g", 2.0, 2L)).toDF("g", "s", "id")
    val got = small.groupBy("g").agg(TopK.topK(col("s"), col("id"), 10).as("t"))
      .select(size(col("t"))).as[Int].head()
    assert(got === 2)
  }
}
