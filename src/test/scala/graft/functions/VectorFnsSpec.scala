package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1; null-safe on floats") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))
    ).toDF("a", "b").select(VectorFns.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("dot and norm2 compute in double") {
    val (d, n) = Seq((Array(3.0f, 4.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")), VectorFns.norm2(col("a")))
      .as[(Double, Double)].head()
    assert(math.abs(d - 11.0) < 1e-12)
    assert(math.abs(n - 5.0) < 1e-12)
  }

  test("native cosine matches the HOF formulation bit-for-bit; null semantics agree") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(200)((Array.fill(64)(rnd.nextFloat() - 0.5f),
      Array.fill(64)(rnd.nextFloat() - 0.5f))).toDF("a", "b")
    val got = vecs.select(VectorFns.cosine(col("a"), col("b")).as("n"),
      VectorFns.cosineHof(col("a"), col("b")).as("h")).as[(Double, Double)].collect()
    assert(got.forall { case (n, h) => n == h })  // exact, not approx

    // length mismatch and null element → null, like zip_with+aggregate
    val weird = Seq(
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](1.0f)),
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f))
    ).toDF("a", "b")
    val nulls = weird.select(VectorFns.cosine(col("a"), col("b"))).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("lshBucket is deterministic and within bit range") {
    val vecs = Seq.tabulate(20)(i => Tuple1(Array.tabulate(8)(j => (i * 8 + j).toFloat / 100 - 0.7f)))
      .toDF("v")
    val b1 = vecs.select(VectorFns.lshBucket(col("v"), 8, 6).as("b")).as[Long].collect()
    val b2 = vecs.select(VectorFns.lshBucket(col("v"), 8, 6).as("b")).as[Long].collect()
    assert(b1.toSeq === b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 64))
  }
}
