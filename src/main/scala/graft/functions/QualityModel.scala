package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier — the fastText-style quality
  * gate training-data pipelines run at corpus scale (a trained model is
  * a weight vector; the ENGINE work is the featurize-and-score plan,
  * which is what's implemented here over a deterministic stand-in
  * vector).
  *
  * Scoring is completely narrow: tokens → hashed bucket → weight lookup
  * → left-fold sum, all inside one row via higher-order functions — no
  * explode, no shuffle, no UDF. The bucket hash is the engine-portable
  * md5 form (`Sampling.hashBucket`'s trick) and the fold order is the
  * array order in both Spark and DuckDB, so scores are bit-identical
  * across engines, not just close.
  */
object QualityModel {

  /** Feature dimension (hash buckets). */
  val Dim = 256

  /** Intercept. */
  val Bias: Double = -0.02

  /** Deterministic stand-in weights in [-1, 1): splitmix64 stream
    * (same generator family as `Dedup.minhashParams`), public so the
    * DuckDB oracle inlines the SAME vector. */
  val weights: IndexedSeq[Double] = {
    var s = 0x51AF7E1CD3B2C9A5L
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    IndexedSeq.fill(Dim)(((next() >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0)
  }

  /** Weights rendered for the DuckDB oracle's list literal. */
  def weightsSqlList: String = weights.mkString("[", ", ", "]")

  /** 0-based feature bucket of one token (portable md5 hash). */
  private def bucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % Dim

  /** Mean hashed-feature weight over a token array, plus bias. */
  def score(toks: Column): Column = {
    // ONE array literal, not Dim stacked lit() expressions: the value
    // ships as constant ArrayData in the plan instead of 256 Literal
    // nodes unrolled into every task binary / codegen unit (guide §5 —
    // r16 task-binary hoist; same values, same lookup)
    val w = typedLit(weights.toArray)
    aggregate(
      transform(toks, t => element_at(w, (bucket(t) + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x) / size(toks) + Bias
  }
}
