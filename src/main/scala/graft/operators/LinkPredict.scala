package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction (Adamic–Adar) — "which pairs of
  * unlinked nodes share many (rare) neighbors" is the classic
  * missing-edge / recommendation primitive on co-occurrence graphs
  * (Adamic & Adar 2003; Liben-Nowell & Kleinberg 2007).
  *
  * Scale contract:
  *  - candidate pairs come ONLY from wedge enumeration — two adjacency
  *    rows joined on the shared middle node z — never from node×node;
  *  - z is degree-capped before the wedge join: a hub with degree d
  *    emits d(d−1)/2 pairs but contributes only 1/ln(d) ≈ nothing to
  *    each, so dropping z above `degCap` bounds wedge volume at
  *    degCap·Σdeg (= degCap·2m) while perturbing scores by a documented
  *    epsilon — the market-basket mega-basket cap (q111) applied to
  *    graphs;
  *  - per-wedge weights 1/ln(deg z) are quantized to a 1e-7 integer
  *    grid BEFORE summation, so the aggregate is an order-independent
  *    BIGINT sum (float summation order differs between engines and
  *    between cluster runs — the engine-wide integer-grid idiom).
  */
object LinkPredict {

  val Scale: Long = 10000000L // 1e-7 grid for 1/ln(deg) weights

  /** Adamic–Adar scores for all unlinked pairs with ≥1 common neighbor
    * of degree ∈ [2, degCap].
    *
    * @param edges undirected edge list, one row per edge with a < b
    * @return (u, v, n_common, aa_units) with u < v; aa_units is the
    *         1e-7-grid integer score (divide by [[Scale]] to read) */
  def adamicAdar(edges: DataFrame, degCap: Int): DataFrame = {
    val adj = edges.select(col("a").as("z"), col("b").as("n"))
      .unionAll(edges.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    // weight rides the capped middle node into the wedge join
    val mid = deg.filter(col("deg") <= degCap && col("deg") >= 2)
      .select(col("z"),
        round(lit(Scale) / log(col("deg").cast("double"))).cast("long").as("w_units"))
    val viaZ = adj.join(mid, "z")
    val wedges = viaZ.select(col("z"), col("n").as("u"), col("w_units"))
      .join(viaZ.select(col("z"), col("n").as("v")), "z")
      .filter(col("u") < col("v"))
    val scored = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"), sum(col("w_units")).as("aa_units"))
    // predictions are MISSING links: anti-join the existing edge set
    scored.join(edges,
        col("u") === col("a") && col("v") === col("b"), "left_anti")
  }
}
