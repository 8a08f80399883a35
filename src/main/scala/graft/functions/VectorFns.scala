package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `ArrayType` embeddings (SURVEY
  * §2.11 "similarity search"). Higher-order functions (`zip_with` +
  * `aggregate`), not UDFs: the arithmetic stays inside Catalyst, is
  * null-safe, and needs no serialization round-trip.
  *
  * All math is done in DOUBLE (inputs cast up from float) so results are
  * bit-comparable with the DuckDB oracle's `::DOUBLE[]` list functions —
  * both sides fold the array sequentially.
  */
object VectorFns {

  private def d(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity — backed by the native one-pass codegen
    * expression (`graft.plans.CosineSimExpr`): the HOF formulation
    * evaluates an interpreted lambda per element (~400 ns/element,
    * measured in tools/DiagCos), which is the inner loop of every
    * similarity operator at corpus scale. Same values, same null
    * semantics (cosineHof retained for the parity spec). */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimExpr.cosineSim(d(a), d(b))

  /** The zip_with/aggregate formulation cosine() replaced. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of projections
    * onto deterministic pseudo-random hyperplanes. The "hyperplane"
    * coefficients are derived per (bit, dimension) from a hash — fully
    * deterministic, no fitted model, so the operator works on any
    * static or streaming batch without a training pass.
    */
  def lshBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val v = d(vec)
    val bits = (0 until nBits).map { b =>
      val coefs = array(lshCoefs(b, dim, seed).map(lit): _*)
      val proj = aggregate(zip_with(v, coefs, (x, c) => x * c), lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** The ±1 hyperplane coefficients for bit `b` — deterministic per
    * (bit, dimension) from a splitmix-style mix. Public so the DuckDB
    * oracle SQL can inline the IDENTICAL planes as list literals: both
    * engines then bucket every vector the same way and the approximate
    * ANN result is exactly reproducible. */
  def lshCoefs(b: Int, dim: Int, seed: Long = 42L): Seq[Double] =
    (0 until dim).map { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((b, i, seed))
      if ((h & 1) == 0) 1.0 else -1.0
    }
}
