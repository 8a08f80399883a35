package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search — the exact-match complement of the BM25
  * bag-of-words family ([[Bm25]]): "did these words occur ADJACENTLY,
  * and where" is what quote detection, boilerplate tracing, and phrase
  * queries need, and a positional posting list answers it with
  * equi-joins only.
  *
  * Scale shape: postings are (doc, position, term) rows — linear in
  * corpus tokens — but every phrase query first prunes them to the
  * phrase's own vocabulary with a literal IN-list (KB-scale, pushed to
  * the scan), so the adjacency joins run over occurrences of the
  * queried words only, keyed by (doc, position): plain shuffled
  * equi-joins, no window over the corpus, no all-pairs anything. A
  * phrase of length L costs L−1 such joins over term-pruned inputs —
  * the standard positional-index query plan (Manning et al., IR book
  * ch. 2), declared in DataFrames so Catalyst pushes the term filters
  * into the posting scan.
  */
object Phrase {

  /** Positional postings: one row per (id, pos, w), positions 1-based so
    * the relational twin's `unnest(range(...))` ordinality lines up.
    * Tokenization is the engine-wide whitespace contract
    * (`TextFns.tokens`). */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos0", "w")))
      .select(col("id"), (col("pos0") + 1).cast("long").as("pos"), col("w"))

  /** Per-document match counts for each phrase: (qid, phrase, id,
    * matches), one row per document that contains the full phrase at
    * least once. `matches` counts anchor positions where every word of
    * the phrase appears at its offset. */
  def phraseCounts(postings: DataFrame,
      phrases: Seq[(String, Seq[String])]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_._2.nonEmpty))
    val vocab = phrases.flatMap(_._2).distinct
    // literal IN-list: pushed into the scan, so the join inputs are the
    // queried words' occurrences, not the corpus
    val pruned = postings.filter(col("w").isin(vocab: _*))
    phrases.map { case (qid, ws) =>
      val anchor = pruned.filter(col("w") === ws.head)
        .select(col("id"), col("pos"))
      val matched = ws.zipWithIndex.drop(1).foldLeft(anchor) {
        case (acc, (word, i)) =>
          val nxt = pruned.filter(col("w") === word)
            .select(col("id").as(s"id_$i"), (col("pos") - i).as(s"p_$i"))
          acc.join(nxt,
              col("id") === col(s"id_$i") && col("pos") === col(s"p_$i"))
            .select(col("id"), col("pos"))
      }
      matched.groupBy(col("id")).agg(count(lit(1)).as("matches"))
        .select(lit(qid).as("qid"), lit(ws.mkString(" ")).as("phrase"),
          col("id"), col("matches"))
    }.reduce(_.unionByName(_))
  }
}
