package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox and the quick brown dog"),
    (2L, "quick brown is not brown quick"),
    (3L, "the slow red fox"),
    (4L, "quick Brown QUICK brown quick brown")).toDF("doc_id", "text")

  test("positional postings are 1-based and lowercase") {
    val p = Phrase.positionalPostings(docs, "doc_id", "text")
      .filter($"id" === 3L).orderBy($"pos")
      .select($"pos", $"w").as[(Long, String)].collect()
    assert(p.toSeq === Seq((1L, "the"), (2L, "slow"), (3L, "red"), (4L, "fox")))
  }

  test("bigram counts every adjacent occurrence, case-insensitively") {
    val counts = Phrase.phraseCounts(
      Phrase.positionalPostings(docs, "doc_id", "text"),
      Seq("q" -> Seq("quick", "brown")))
      .select($"id", $"matches").as[(Long, Long)].collect().toMap
    // doc1: positions 2,7; doc2: only "quick brown" at 1 ("brown quick"
    // must NOT count); doc4: 1, 3, 5
    assert(counts === Map(1L -> 2L, 2L -> 1L, 4L -> 3L))
  }

  test("trigram requires all three words in order") {
    val counts = Phrase.phraseCounts(
      Phrase.positionalPostings(docs, "doc_id", "text"),
      Seq("q" -> Seq("quick", "brown", "fox")))
      .select($"id", $"matches").as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 1L)) // only "quick brown fox" in doc1
  }

  test("term pruning reaches the scan: pushed filter on the vocab IN-list") {
    val plan = Phrase.phraseCounts(
      Phrase.positionalPostings(docs, "doc_id", "text"),
      Seq("q" -> Seq("quick", "brown")))
      .queryExecution.executedPlan.toString
    // the posting explode is filtered to the phrase vocabulary before
    // the adjacency join — no unfiltered posting side in the join
    assert(plan.contains("quick") && plan.contains("brown"))
  }
}
