package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q122 invariants beyond the row-hash oracle: the IVF restriction and
  * the ADC ranking each behave like the index they model.
  */
class IvfPqSpec extends SparkSpec {

  // sf0.01: the probe's cell is populated (sf0.001 can leave it empty,
  // which is correct IVF behavior but vacuous as a test)
  private val sfDir = "/root/testdata/sf0.01"

  test("ADC distances are nonnegative and sorted ascending") {
    val rows = VectorQueries.q122IvfPqAnn.run(spark, sfDir)
      .select(col("approx_dist")).collect().map(_.getDouble(0))
    assert(rows.nonEmpty)
    rows.foreach(d => assert(d >= 0.0))
    rows.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
  }

  test("every result lies in the probe's IVF cell (independent reassignment)") {
    // reimplement the coarse quantizer driver-side in plain Scala and
    // check q122 only ever surfaces members of the probe's cell
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = vecs.values.head.length
    val cells = Array.tabulate(8) { c =>
      val members = vecs.collect { case (id, v) if id % 8 == c => v }
      val m = new Array[Double](dim)
      members.foreach(v => for (i <- 0 until dim) m(i) += v(i))
      for (i <- 0 until dim) m(i) /= members.size
      m
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def cellOf(v: Array[Double]): Int = {
      val sims = cells.map(cos(v, _))
      sims.indexOf(sims.max) // first index of max = ties to lowest cell
    }
    val probeCell = cellOf(vecs(0L))
    val pq = VectorQueries.q122IvfPqAnn.run(spark, sfDir)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(pq.nonEmpty)
    pq.foreach(id => assert(cellOf(vecs(id)) === probeCell,
      s"vec $id ranked but lives outside probe cell $probeCell"))
  }
}
