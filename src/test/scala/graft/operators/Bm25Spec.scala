package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // docs engineered so shingle df's land inside the [2, dfMaxForCorpus]
  // vocabulary window: the "alpha beta gamma" docs share their shingles
  // (df=3), the "zeta" docs share theirs (df=2), filler docs are unique
  // (df=1 → pruned)
  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon one"),
    (2L, "alpha beta gamma delta epsilon two"),
    (3L, "alpha beta gamma delta epsilon three"),
    (4L, "zeta eta theta iota kappa four"),
    (5L, "zeta eta theta iota kappa five"),
    (6L, "completely different words here entirely six"),
    (7L, "nothing shared with anyone else ever seven"),
    (8L, "unique utterly unrelated text payload eight")).toDF("doc_id", "text")

  test("a doc retrieves its shingle-sharing neighbors first") {
    val got = Bm25.topK(corpus, "doc_id", "text",
        querySelector = col("doc_id") === 1, k = 3)
      .orderBy("rnk").select("doc_id").as[Long].collect().toSeq
    // docs 2 and 3 share doc 1's high-idf shingles; nothing else scores
    assert(got.take(2).toSet === Set(2L, 3L))
    assert(!got.contains(1L)) // self excluded
    assert(!got.exists(Set(6L, 7L, 8L))) // df=1 terms prune — no match
  }

  test("excludeSelf=false keeps the source doc retrievable (known-item mode)") {
    // the q212 eval mode: the query IS a corpus doc, so the source doc
    // must stay in the candidate set and (sharing all its own shingles
    // at full tf) rank first; the default mode must keep excluding it
    val index = Bm25.postingIndex(corpus, "doc_id", "text")
    val q1 = corpus.filter(col("doc_id") === 1)
      .select(col("doc_id").as("qid"),
        explode(graft.functions.TextFns.shingles(
          graft.functions.TextFns.tokens(col("text")), 3)).as("t"))
      .distinct()
    val withSelf = Bm25.topKAgainstIndex(q1, index, "doc_id", k = 3,
        excludeSelf = false)
      .orderBy("rnk").select("doc_id").as[Long].collect().toSeq
    assert(withSelf.head === 1L, s"source doc not first: $withSelf")
    val without = Bm25.topKAgainstIndex(q1, index, "doc_id", k = 3)
      .orderBy("rnk").select("doc_id").as[Long].collect().toSeq
    assert(!without.contains(1L) && without.take(2).toSet === Set(2L, 3L))
  }

  test("retrieval is deterministic under repartitioning") {
    val a = Bm25.topK(corpus, "doc_id", "text", col("doc_id") % 2 === 1, k = 3)
      .orderBy("qid", "rnk").collect().map(_.toString).toSeq
    val b = Bm25.topK(corpus.repartition(7), "doc_id", "text", col("doc_id") % 2 === 1, k = 3)
      .orderBy("qid", "rnk").collect().map(_.toString).toSeq
    assert(a === b && a.nonEmpty)
  }

  test("operator scores equal a plain driver-side BM25 reference on a random corpus") {
    // pseudo-random corpus from a fixed seed; words drawn from a small
    // vocabulary so shingle df's land inside the [2, dfMax] window
    val rnd = new scala.util.Random(42)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val docs = (1L to 40L).map { id =>
      (id, Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Bm25.topK(df, "doc_id", "text", col("doc_id") % 7 === 0, k = 4)
      .select("qid", "rnk", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3)).sorted.toSeq

    // driver-side reference: same tokenization (3-gram shingles), same
    // df window, same k1/b arithmetic, same round-then-rank contract
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val sh = toks.view.mapValues(ts => ts.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSeq).toMap
    val tf = sh.map { case (id, s) => id -> s.groupBy(identity).view.mapValues(_.size).toMap }
    val dfr = sh.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    val dfMax = graft.functions.TextFns.dfMaxForCorpus(docs.size)
    val admitted = dfr.filter { case (_, d) => d >= 2 && d <= dfMax }.toMap
    val dl = sh.view.mapValues(_.size.toDouble).toMap
    val withLen = dl.filter(_._2 >= 1)
    val (nD, avgdl) = (withLen.size.toDouble, withLen.values.sum / withLen.size)
    def wgt(id: Long, t: String): Double = {
      val d = admitted(t).toDouble
      val c = tf(id)(t).toDouble
      math.log(1 + (nD - d + 0.5) / (d + 0.5)) * (c * 2.2) /
        (c + 1.2 * (dl(id) / avgdl * 0.75 + 0.25))
    }
    val expect = (for {
      qid <- docs.map(_._1) if qid % 7 == 0
      qTerms = sh(qid).distinct.filter(admitted.contains)
      scored = docs.map(_._1).filter(_ != qid).flatMap { id =>
        val s = qTerms.filter(t => tf(id).contains(t)).map(t => wgt(id, t)).sum
        if (s > 0) Some(id -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP)) else None
      }
      ((id, _), i) <- scored.sortBy { case (id, s) => (-s, id) }.take(4).zipWithIndex
    } yield (qid, i + 1, id)).sorted
    assert(got === expect)
  }

  test("incremental postings + serving fold reproduce the one-shot index exactly") {
    // the append-only story: postingDeltas is corpus-statistics-free,
    // weightsFromPostings folds idf/avgdl at read time — composed, they
    // must equal postingIndex bit-for-bit on a corpus where every doc
    // has >= n tokens (here all do)
    val viaStore = Bm25.weightsFromPostings(
        Bm25.postingDeltas(corpus, "doc_id", "text"), "doc_id")
      .as[(Long, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val oneShot = Bm25.postingIndex(corpus, "doc_id", "text")
      .as[(Long, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(viaStore.keySet === oneShot.keySet && viaStore.nonEmpty)
    viaStore.keys.foreach(k => assert(viaStore(k) === oneShot(k), s"posting $k"))
    // and a delta is PURELY per-doc: replaying one doc's postings from a
    // singleton corpus matches its rows in the full-corpus postings
    val solo = Bm25.postingDeltas(corpus.filter(col("doc_id") === 1), "doc_id", "text")
      .as[(Long, String, Long, Double)].collect().toSet
    val fromFull = Bm25.postingDeltas(corpus, "doc_id", "text")
      .filter(col("doc_id") === 1)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(solo === fromFull && solo.nonEmpty)
  }

  test("a precomputed bucketed posting index joins with no exchange under it") {
    // the q94 incremental-ingest claim applied to retrieval: materialize
    // the index bucketed by term once, then every query batch must read
    // it in bucket layout — zero shuffle on the index side, O(batch)
    // per batch, never O(corpus)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.FileSourceScanExec
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flat(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flat(q.plan)
      case _ => p +: p.children.flatMap(flat)
    }
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = Bm25.postingIndex(docs, "doc_id", "text")
    graft.sources.Sinks.writeBucketed(idx, "bm25_idx", nBuckets = 4,
      bucketCols = Seq("t"), sortCols = Seq("t"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          explode(graft.functions.TextFns.shingles(
            graft.functions.TextFns.tokens(col("text")), 3)).as("t"))
        .distinct()
      val scored = Bm25.topKAgainstIndex(queries, spark.table("bm25_idx"), "doc_id", 5)
      val joins = flat(scored.queryExecution.executedPlan).collect {
        case j: BaseJoinExec if flat(j).exists {
          case s: FileSourceScanExec =>
            s.relation.location.rootPaths.exists(_.toString.contains("bm25_idx"))
          case _ => false
        } => j
      }
      assert(joins.nonEmpty, "posting join over the index not found")
      val idxSide = joins.last.children.find(c => flat(c).exists {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains("bm25_idx"))
        case _ => false
      })
      assert(idxSide.nonEmpty)
      assert(!flat(idxSide.get).exists(_.isInstanceOf[ShuffleExchangeExec]),
        "index side of the retrieval join shuffles — bucketing unused:\n" + idxSide.get)
      // and the indexed path returns rows (same contract as the inline path)
      assert(scored.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bm25_idx")
    }
  }
}
