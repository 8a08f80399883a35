package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock probe for the Bm25 incremental-index path (the r7 lesson:
  * a plan that only a spec ever sees is a plan nobody has timed).
  * Measures, at SPARK_GRAFT_SF_DIR on local[32], min of 2 interleaved:
  *
  *  - `inline`: the registered q137 shape — posting index computed in
  *    the same job as the retrieval (what the bench times every round);
  *  - `index_build`: materializing `Bm25.postingIndex` as a
  *    term-bucketed table (paid ONCE per corpus version);
  *  - `query_batch`: a fresh query batch joined against the stored
  *    index (paid per serving batch — the plan Bm25Spec pins as
  *    zero-exchange under the index).
  *
  * The claim being tested: query_batch ≪ inline, so at 100 TB the
  * index amortizes after the first few batches. Writes
  * DIAG_INDEX_r{N}.json (env SPARK_GRAFT_ROUND, default r08).
  */
object DiagIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config(graft.sources.Tables.NanosAsLongKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import graft.operators.Bm25
    import graft.functions.TextFns
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val table = "bm25_idx_diag"
    def queryTerms = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        explode(TextFns.shingles(TextFns.tokens(col("text")), 3)).as("t"))
      .distinct()

    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val ops: Seq[(String, () => Long)] = Seq(
      "inline" -> (() => Bm25.topK(docs, "doc_id", "text",
        col("doc_id") % 97 === 0, k = 5).count()),
      "index_build" -> (() => {
        spark.sql(s"DROP TABLE IF EXISTS $table")
        graft.sources.Sinks.writeBucketed(
          Bm25.postingIndex(docs, "doc_id", "text"), table,
          nBuckets = 32, bucketCols = Seq("t"), sortCols = Seq("t"))
        spark.table(table).count()
      }),
      "query_batch" -> (() => Bm25.topKAgainstIndex(
        queryTerms, spark.table(table), "doc_id", 5).count()))

    val results = scala.collection.mutable.LinkedHashMap[String, (List[Double], Long)]()
    for (r <- 1 to 2; (name, f) <- ops) {
      val (sec, rows) = time(f)
      val prev = results.getOrElse(name, (Nil, 0L))
      results(name) = (prev._1 :+ sec, rows)
      System.err.println(f"[diagindex] rep $r $name%-12s $sec%7.2f s rows=$rows")
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val round = sys.env.getOrElse("SPARK_GRAFT_ROUND", "r08")
    val qjson = results.map { case (k, (ts, rows)) =>
      s""""$k":{"min_sec":${ts.min},"reps":[${ts.mkString(",")}],"rows":$rows}"""
    }.mkString("{", ",", "}")
    val amort = results("inline")._1.min /
      math.max(1e-9, results("query_batch")._1.min)
    val json = s"""{"sf_dir":"$sfDir","ops":$qjson,""" +
      f""""inline_over_batch":$amort%.1f,""" +
      s""""note":"query_batch is the per-serving-batch cost against the stored bucketed index; inline recomputes the index per query run. inline_over_batch = how many query batches amortize one inline run even BEFORE counting the index build being shared across batches."}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"DIAG_INDEX_$round.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
