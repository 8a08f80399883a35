package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity of the native PQ encode against the unrolled declarative
  * formulation it replaced (the q93/q122 oracles replay the identical
  * arithmetic in DuckDB, so parity here ⇒ oracle parity).
  */
class PqEncodeExprSpec extends SparkSpec {

  private val (m, sub, c) = (8, 8, 16)

  test("native codes ≡ unrolled argmin codes on the real embeddings") {
    val base = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cbRows = base
      .select(pmod(col("vec_id"), lit(c)).cast("int").as("j"),
        posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("j"), col("i")).agg(round(avg(col("x")), 6).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def sqdistTo(m0: Int, j: Int) =
      (0 until sub).map { kk =>
        val diff = element_at(col("v"), m0 * sub + kk + 1) - lit(cbRows((j, m0 * sub + kk)))
        diff * diff
      }.reduce(_ + _)
    def codeCol(m0: Int) = {
      val dArr = array((0 until c).map(j => sqdistTo(m0, j)): _*)
      (array_position(dArr, array_min(dArr)) - 1).cast("int")
    }
    val rows = base
      .select(col("vec_id"),
        PqEncodeExpr.pqEncode(col("v"), cbRows, m, sub, c).as("native"),
        array((0 until m).map(codeCol): _*).as("decl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"mismatch at vec ${r.getLong(0)}")
    }
  }
}
