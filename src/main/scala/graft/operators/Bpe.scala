package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) merge learning — the vocabulary
  * induction step of tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"): N rounds of
  * exact adjacent-symbol-pair counting, top-pair selection, and greedy
  * merge application, expressed in the engine's iterative-aggregate
  * house style.
  *
  * Scale shape (the industrial trainer trick): the ONLY corpus-sized
  * stage is the word-dictionary build — one explode + one groupBy —
  * because pair counts factor through word frequencies. Every merge
  * round then runs at DICT grain (Heaps-law bounded, ~O(corpusᵝ),
  * β≈0.5): one dict-grain pair aggregate, a 1-row argmax (count DESC,
  * pair ASC — the q231 argmax convention), and a dict-grain merge
  * apply, with a `localCheckpoint` lineage cut per round (the
  * Iterate.fixpoint discipline) so plan depth stays constant across
  * rounds instead of accumulating 20 nested aggregates.
  *
  * Symbol encoding: a word's current segmentation travels as ONE
  * string with every symbol wrapped in `~` fences — "low" starts as
  * "~l~~o~~w~" — so applying merge (l, r) is a plain
  * `replace(s, "~l~~r~", "~lr~")`. The doubled fence makes adjacent
  * occurrences share no characters, so the left-to-right
  * non-overlapping `replace` both engines implement IS the standard
  * greedy BPE apply (overlaps like "aaa" merge left-first; consecutive
  * pairs like "abab" both merge). `~` cannot collide with symbol text:
  * words are [a-z]+ only.
  *
  * Determinism: counts are exact integers; the argmax tie rule is
  * (pair_count DESC, lhs ASC, rhs ASC) over ASCII strings — binary
  * collation in any engine. If the dictionary runs out of pairs before
  * `rounds` merges (single-symbol words only), the remaining rounds
  * emit no row, identically in both dialects.
  */
object Bpe {

  /** The (word, cnt, s) dictionary: lowercase [a-z]+ word frequencies
    * with the initial per-character segmentation string. This is the
    * one corpus-sized stage. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("s", concat(lit("~"),
        array_join(regexp_extract_all(col("word"), lit("."), lit(0)), "~~"),
        lit("~")))

  /** Adjacent symbol pairs of the current segmentation, weighted by
    * word frequency — dict-grain (rows ∝ Σ word symbol lengths). */
  private[graft] def pairCounts(dict: DataFrame): DataFrame =
    dict
      .select(col("cnt"), split(trim(col("s"), "~"), "~~").as("a"))
      .select(col("cnt"), col("a"),
        posexplode(slice(col("a"), lit(1), size(col("a")) - 1)).as(Seq("i", "lhs")))
      .select(col("cnt"), col("lhs"),
        element_at(col("a"), col("i") + 2).as("rhs"))
      .groupBy(col("lhs"), col("rhs"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** N rounds of exact merge learning over the corpus' word dictionary.
    *
    * Each round runs ONE distributed job: the dict-grain pair
    * aggregate's 1-row argmax is collected (the k-means-codebook
    * bounded-collect class — the argmax IS the learned parameter, one
    * row per round) and embedded as a literal, so the merge apply is a
    * narrow stacked projection over the checkpointed dictionary — no
    * per-round shuffle, and a lineage cut every 8 rounds bounds the
    * stacked-projection depth (round k otherwise re-executes all k−1
    * prior replaces — trivial at dict grain for 20 rounds, quadratic
    * at production round counts). Production vocab induction
    * (30–50k merges) batches the selection — take the top-B mutually
    * non-adjacent pairs per round, the standard rounds-reduction — on
    * exactly these shapes; the exact top-1 form here is the
    * reference-semantics deep prefix of that.
    * @return (step, lhs, rhs, pair_count) — the learned merge table in
    *         merge order */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = wordDict(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.Buffer[(Int, String, String, Long)]()
    for (step <- 1 to rounds) {
      val top = pairCounts(cur)
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1)
        .as[(String, String, Long)].collect()
      top.foreach { case (l, r, c) =>
        merges += ((step, l, r, c))
        cur = cur.withColumn("s",
          replace(col("s"), lit(s"~$l~~$r~"), lit(s"~$l$r~")))
      }
      if (step % 8 == 0) cur = cur.localCheckpoint()
    }
    merges.toSeq.toDF("step", "lhs", "rhs", "pair_count")
      .orderBy(col("step"))
  }

  /** Re-segment `docs` words with a learned merge table (the APPLY
    * side of BPE, replaying merges in learned order) — exposed for the
    * spec's round-trip check; production tokenization would broadcast
    * the merge list exactly like this. */
  def segment(dict: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(dict) { case (d, (l, r)) =>
      d.withColumn("s",
        expr(s"replace(s, '~$l~~$r~', '~$l$r~')"))
    }

  /** The APPLY-side efficiency curve: [[learnMerges]]' loop, also
    * recording after every merge the corpus-weighted total token
    * (symbol) count — the diminishing-returns curve a tokenizer team
    * reads to size the vocabulary (marginal compression per merge).
    * Step 0 is the pre-merge character baseline (null merge columns).
    * Same per-round shapes and bounded 1-row collects as learnMerges;
    * the extra aggregate per round is dict-grain.
    * @return (step, lhs, rhs, pair_count, total_tokens,
    *         tokens_per_word) — tokens_per_word is corpus-weighted,
    *         rounded half-up to 6 dp (both engines' round convention
    *         for positive values) */
  def compressionCurve(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = wordDict(docs, textCol).localCheckpoint()
    def totals(d: DataFrame): (Long, Long) = d
      .select(sum(col("cnt") * size(split(trim(col("s"), "~"), "~~"))).as("t"),
        sum(col("cnt")).as("w"))
      .as[(Long, Long)].head()
    val (t0, w) = totals(cur)
    val rows = scala.collection.mutable.Buffer[
      (Int, Option[String], Option[String], Option[Long], Long)](
      (0, None, None, None, t0))
    for (step <- 1 to rounds) {
      val top = pairCounts(cur)
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1)
        .as[(String, String, Long)].collect()
      top.foreach { case (l, r, c) =>
        cur = cur.withColumn("s",
          replace(col("s"), lit(s"~$l~~$r~"), lit(s"~$l$r~")))
        val (tk, _) = totals(cur)
        rows += ((step, Some(l), Some(r), Some(c), tk))
      }
      if (step % 8 == 0) cur = cur.localCheckpoint()
    }
    // the ratio rounds through Catalyst's round (exact-decimal HALF_UP)
    // — the same convention every oracle-matched double in the registry
    // uses, rather than a driver-side float rounding
    rows.toSeq
      .toDF("step", "lhs", "rhs", "pair_count", "total_tokens")
      .select(col("step"), col("lhs"), col("rhs"), col("pair_count"),
        col("total_tokens"),
        (round(col("total_tokens").cast("double") / lit(w), 6) + lit(0.0d))
          .as("tokens_per_word"))
      .orderBy(col("step"))
  }
}
