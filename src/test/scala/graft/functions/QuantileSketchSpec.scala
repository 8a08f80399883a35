package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val lo = 0L
  private val width = 10L
  private val nBins = 20

  private def driverSketch(xs: Seq[Long]): Array[Long] = {
    val a = QuantileSketch.agg(lo, width, nBins)
    xs.foldLeft(a.zero)((buf, x) => a.reduce(buf, x))
  }

  test("merge is the vector sum of partials — split-anywhere associativity") {
    val a = QuantileSketch.agg(lo, width, nBins)
    var s = 7L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.floorMod(s, 250L) }
    val xs = Seq.fill(500)(nxt())
    val whole = driverSketch(xs)
    for (cut <- Seq(1, 100, 499)) {
      val (l, r) = xs.splitAt(cut)
      val merged = a.merge(driverSketch(l), driverSketch(r))
      assert(merged.toSeq === whole.toSeq, s"cut=$cut")
    }
  }

  test("estimate is within width/2 of the exact rank-based percentile") {
    var s = 99L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.floorMod(s, 200L) }
    val xs = Seq.fill(1000)(nxt())
    val counts = driverSketch(xs).toSeq
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
      val est = QuantileSketch.estimate(counts, q, lo, width).get
      val exact = sorted((math.ceil(q * xs.length) - 1).toInt)
      assert(math.abs(est - exact) <= width / 2, s"q=$q est=$est exact=$exact")
    }
  }

  test("out-of-range values clamp into the edge bins") {
    val counts = driverSketch(Seq(-100L, -1L, 0L, 5L, 999L, 10000L)).toSeq
    assert(counts.head === 4L) // two underflows + 0 + 5
    assert(counts.last === 2L) // two overflows
    assert(counts.sum === 6L)  // nothing dropped
  }

  test("Spark udaf sketch ≡ driver reference; relational walk ≡ estimate()") {
    var s = 123L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.floorMod(s, 180L) }
    val xs = Seq.fill(400)(nxt())
    val df = xs.toDF("v")
    val sparkCounts = df.agg(QuantileSketch.sketch(col("v"), lo, width, nBins).as("bins"))
      .select("bins").as[Seq[Long]].head()
    assert(sparkCounts === driverSketch(xs).toSeq)
    // the q134-style relational walk lands on the same midpoints
    val ex = df.agg(QuantileSketch.sketch(col("v"), lo, width, nBins).as("bins"))
      .select(posexplode(col("bins")).as(Seq("bin", "cnt")))
      .withColumn("cum", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.orderBy("bin")))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    for (q <- Seq(0.5, 0.9)) {
      val rel = ex.agg(min(when(col("cum") >= ceil(lit(q) * col("n")),
          col("bin") * width + width / 2)))
        .as[Long].head()
      assert(rel === QuantileSketch.estimate(sparkCounts, q, lo, width).get, s"q=$q")
    }
  }
}
