package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala reference: interleave bit i of x at position 2i, y at 2i+1
  private def mortonRef(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))
    }

  test("zValue2 matches the bit-interleave reference on edge and random points") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (65535, 0),
      (12345, 54321), (255, 256), (1 << 15, (1 << 15) - 1))
    val got = pts.toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y")).as("z")).as[Long].collect()
    assert(got.toSeq === pts.map { case (x, y) => mortonRef(x, y) })
  }

  test("zValue2 uses only the low 16 bits of each dimension") {
    val got = Seq((65536 + 7, (1 << 20) + 9)).toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y")).as("z")).as[Long].head()
    assert(got === mortonRef(7, 9))
  }

  test("zorderRepartition yields disjoint z-ranges and clustered bounding boxes") {
    // a 64x64 grid, shuffled on write; 16 output partitions
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).cast("int").as("x"), (col("id") / 64).cast("int").as("y"))
      .repartition(7) // deliberately scrambled input layout
    val parts = ZOrder.zorderRepartition(grid, "x", "y", 16)
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"),
        min(ZOrder.zValue2(col("x"), col("y"))).as("zmin"),
        max(ZOrder.zValue2(col("x"), col("y"))).as("zmax"),
        (max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"))
      .collect()
    assert(parts.map(_.getAs[Long]("n")).sum === 64L * 64)
    // disjoint, ordered z-ranges across partitions (repartitionByRange)
    val ranges = parts.map(r => (r.getAs[Long]("zmin"), r.getAs[Long]("zmax")))
      .sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo)
      case _ => () }
    // clustering quality: every partition's bounding box is a fraction of
    // the 63x63 full extent (a scrambled layout would give ~full boxes).
    // 4096 cells / 16 parts = 256 cells ≈ a 16x16 z-block; quadtree
    // alignment can at worst double one side.
    parts.foreach { r =>
      assert(r.getAs[Int]("dx") <= 32, s"dx too wide: $r")
      assert(r.getAs[Int]("dy") <= 32, s"dy too wide: $r")
    }
  }
}
