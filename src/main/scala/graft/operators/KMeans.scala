package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Distributed spherical k-means (Lloyd iterations) over an embedding
  * column — the clustering primitive under semantic dedup (SemDeDup,
  * Abbas et al. 2023) and IVF index training.
  *
  * Scale design (the only shape that survives 100 TB):
  *  - the CODEBOOK is the only thing that ever leaves the executors —
  *    k×dim doubles per iteration (a few KB), collected and re-broadcast
  *    as a literal. The corpus itself is never shuffled for assignment:
  *    argmax-over-k is a fully NARROW map (same trick as the IVF
  *    assignment in q45).
  *  - the centroid recompute is one partial+final hash aggregate per
  *    iteration, shuffling k×dim rows (posexplode by dimension), not the
  *    corpus.
  *  - iterations re-derive assignment from the literal codebook rather
  *    than chaining DataFrames, so the plan/lineage stays O(1) in the
  *    iteration count.
  *
  * Determinism (required by the oracle hash gate): seeding is
  * `id % k`, argmax ties break toward the LOWEST cell, and centroid
  * components are rounded to 6 dp — so both engines iterate through
  * bit-identical codebooks (the mean of float-precision inputs is an
  * exact double; see q32's parity note).
  */
object KMeans {

  /** One argmax-assignment pass against a literal codebook. */
  private def assignCell(v: Column, codebook: Array[Seq[Double]]): Column = {
    val cb = array(codebook.map(c => array(c.map(lit): _*)): _*)
    val simArr = transform(cb, c => VectorFns.cosine(v, c))
    // first index holding the max = lowest cell on ties (mirrors the
    // oracle's ORDER BY s DESC, cell)
    (array_position(simArr, array_max(simArr)) - 1).cast("int")
  }

  /** Element-wise per-cell mean of `v` grouped by `cell`, rounded to
    * 6 dp, returned in cell order as a driver-side codebook. */
  private def centroids(assigned: DataFrame, k: Int): Array[Seq[Double]] = {
    val rows = assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cell"), col("i")).agg(round(avg(col("x")), 6).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("c"))
      .orderBy(col("cell"))
      .collect()
    // cells can die (lose all members); keep their previous slot absent
    // by materializing a dense k-array is the caller's concern — with
    // id%k seeding every cell starts populated and spherical updates
    // rarely empty one, but guard anyway.
    val byCell = rows.map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    (0 until k).map(c => byCell.getOrElse(c, Seq.fill(64)(0.0))).toArray
  }

  /** Run `iters` Lloyd rounds; returns (assignment, finalCodebook).
    * Assignment columns: every column of `df` plus `v` (double vector)
    * and `cell` (int). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): (DataFrame, Array[Seq[Double]]) = {
    val base = df.withColumn("v", col(vecCol).cast("array<double>"))
    var assigned = base.withColumn("cell",
      pmod(col(idCol), lit(k)).cast("int"))
    var codebook: Array[Seq[Double]] = null
    for (_ <- 1 to iters) {
      codebook = centroids(assigned, k)
      assigned = base.withColumn("cell", assignCell(col("v"), codebook))
    }
    (assigned, codebook)
  }

  /** Cosine of each row's vector to its own (final) cluster centroid. */
  def cosToCentroid(v: Column, cell: Column, codebook: Array[Seq[Double]]): Column = {
    val cb = array(codebook.map(c => array(c.map(lit): _*)): _*)
    VectorFns.cosine(v, element_at(cb, cell + 1))
  }

  /** SemDeDup-style per-cluster screen: within each cluster, rows whose
    * cosine-to-centroid is at least `tau` form the dense core and are
    * REDUNDANT except the single best representative (highest cosine,
    * ties → lowest id). Rows below `tau` are informative and all kept.
    * One window over the cell partitioning — no pairwise join; the
    * pairwise O(|cell|²) formulation this replaces is the reason
    * SemDeDup clusters first. */
  def semDedupKeep(assigned: DataFrame, idCol: String,
      codebook: Array[Seq[Double]], tau: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withCos = assigned.withColumn("cos_c",
      cosToCentroid(col("v"), col("cell"), codebook))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("cos_c").desc, col(idCol))
    withCos
      .withColumn("rn", row_number().over(w))
      .filter(col("cos_c") < tau || col("rn") === 1)
      .drop("rn")
  }
}
