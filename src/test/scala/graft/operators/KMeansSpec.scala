package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated blobs on orthogonal axes: axis a ± small noise.
    * dim 4 keeps the test fast; the operator is dim-agnostic. */
  private def blobs = {
    val rows = (0 until 40).map { i =>
      val axis = i % 2 // interleaved ids → the id%k seed starts WRONG
      val noise = 0.05 * ((i * 2654435761L % 97) / 97.0 - 0.5)
      val v = Array.tabulate(4)(d => (if (d == axis) 1.0 else 0.0) + (if (d == 3) noise else 0.0))
      (i.toLong, s"blob$axis", v)
    }
    rows.toDF("vec_id", "label", "embedding")
  }

  test("Lloyd rounds recover well-separated blobs from a mixed seed") {
    val (assigned, codebook) = KMeans.fit(blobs, "vec_id", "embedding", k = 2, iters = 3)
    assert(codebook.length === 2)
    // every member of a blob lands in the same cell, different per blob
    val cells = assigned.groupBy("label")
      .agg(countDistinct("cell").as("nc"), first("cell").as("c"))
      .collect().map { r =>
        assert(r.getLong(1) == 1, s"${r.getString(0)} split across cells")
        r.getString(0) -> r.getInt(2)
      }.toMap
    assert(cells("blob0") !== cells("blob1"))
  }

  test("fit is deterministic across runs") {
    val (_, cb1) = KMeans.fit(blobs, "vec_id", "embedding", 2, 2)
    val (_, cb2) = KMeans.fit(blobs, "vec_id", "embedding", 2, 2)
    assert(cb1.map(_.toList).toList === cb2.map(_.toList).toList)
  }

  test("semDedupKeep keeps one representative per dense core, all of the tail") {
    val (assigned, codebook) = KMeans.fit(blobs, "vec_id", "embedding", 2, 3)
    // tau=0: EVERY member is core → exactly one survivor per cell
    val only = KMeans.semDedupKeep(assigned, "vec_id", codebook, tau = 0.0)
    assert(only.count() === 2)
    // tau>1: nothing is core → everything kept
    val all = KMeans.semDedupKeep(assigned, "vec_id", codebook, tau = 1.1)
    assert(all.count() === 40)
    // representative is the member closest to its centroid
    val rep = only.select("vec_id").as[Long].collect().toSet
    val best = assigned
      .withColumn("cos_c", KMeans.cosToCentroid(col("v"), col("cell"), codebook))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cell")
          .orderBy(col("cos_c").desc, col("vec_id"))))
      .filter(col("rn") === 1).select("vec_id").as[Long].collect().toSet
    assert(rep === best)
  }

  test("assignment plan is narrow — no shuffle between scan and cell argmax") {
    val (assigned, _) = KMeans.fit(blobs, "vec_id", "embedding", 2, 1)
    // the assignment DataFrame itself plans no Exchange: argmax against
    // the literal codebook is a map-only operation
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffled:\n$plan")
  }
}
