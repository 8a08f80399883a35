package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.sources.Tables

/** Sub-step timer for the q144 exact-dedup stage shapes (r16 A/B):
  * OLD = lazy quality projection carrying text, digest-agg winners,
  * semi-join restore; NEW = fused digest+quality skinny projection,
  * min-of-struct winners, scan-and-join restore. */
object DiagQ144 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for")
    val docs = Tables.documents(spark, sfDir)

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      // OLD
      val kept = docs
        .select(col("doc_id"), col("text"), TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("text"),
          size(col("toks")).as("n_tokens"),
          TextFns.punctRatio(col("text")).as("punct_ratio"),
          (TextFns.markerHits(col("toks"), Stopwords).cast("double") /
            greatest(size(col("toks")), lit(1))).as("stop_ratio"))
        .filter(col("n_tokens").between(10, 5000)
          && col("punct_ratio") < 0.2 && col("stop_ratio") >= 0.02)
        .select(col("doc_id"), col("text"), col("n_tokens"))
      val winnersOld = kept.groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val exactOld = kept.join(winnersOld, Seq("doc_id"), "left_semi")
      time("old: winners.count")(winnersOld.count())
      time("old: exact noop")(noop(exactOld))

      // NEW
      val lab = docs
        .select(col("doc_id"), col("text"), TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"), md5(col("text")).as("digest"),
          size(col("toks")).as("n_tokens"),
          TextFns.punctRatio(col("text")).as("punct_ratio"),
          (TextFns.markerHits(col("toks"), Stopwords).cast("double") /
            greatest(size(col("toks")), lit(1))).as("stop_ratio"))
        .filter(col("n_tokens").between(10, 5000)
          && col("punct_ratio") < 0.2 && col("stop_ratio") >= 0.02)
        .select(col("doc_id"), col("digest"), col("n_tokens"))
      val winnersNew = lab.groupBy(col("digest"))
        .agg(min(struct(col("doc_id"), col("n_tokens"))).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.n_tokens").as("n_tokens"))
      val exactNew = docs.select(col("doc_id"), col("text"))
        .join(winnersNew, Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("n_tokens"))
      time("new: winners.count")(winnersNew.count())
      time("new: exact noop")(noop(exactNew))

      // NEW + checkpoint
      val labC = lab.localCheckpoint()
      time("newC: checkpoint job (done above)")(labC.count())
      val winnersC = labC.groupBy(col("digest"))
        .agg(min(struct(col("doc_id"), col("n_tokens"))).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.n_tokens").as("n_tokens"))
      val exactC = docs.select(col("doc_id"), col("text"))
        .join(winnersC, Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("n_tokens"))
      time("newC: exact noop")(noop(exactC))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

      // full pipeline, both shapes
      def rest(exact: org.apache.spark.sql.DataFrame): Long = {
        import graft.operators.Dedup
        import graft.functions.Sampling
        val sh = docs
          .repartition(col("doc_id"))
          .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(TextFns.shinglePositions(col("toks"), 3)).as("i"))
          .select(col("doc_id"), TextFns.shingleAt(col("toks"), col("i"), 3).as("s"))
          .dropDuplicates(Seq("doc_id", "s"))
        val bench = sh.filter(col("doc_id") % 97 === 0).select(col("s")).distinct()
        val flagged = sh.filter(col("doc_id") % 97 =!= 0)
          .join(bench, "s")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 3)
          .select(col("doc_id"))
        val decon = exact.filter(col("doc_id") % 97 =!= 0)
          .join(flagged, Seq("doc_id"), "left_anti")
          .cache()
        val pairs = Dedup.minhashLshPairs(decon, "doc_id", "text",
            n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
          .select(col("id_a"), col("id_b"))
        val fin = Dedup.dropNearDuplicates(decon, "doc_id", pairs)
        val out = Sampling.assignShards(fin, col("doc_id"), 8)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("sum_tokens"),
            sum(col("pos") * (col("doc_id") % 997)).as("ord_checksum"))
          .orderBy(col("shard"))
        out.count()
      }
      time("FULL old")(rest(exactOld))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      time("FULL new")(rest(exactNew))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val labC2 = lab.localCheckpoint()
      val winnersC2 = labC2.groupBy(col("digest"))
        .agg(min(struct(col("doc_id"), col("n_tokens"))).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.n_tokens").as("n_tokens"))
      val exactC2 = docs.select(col("doc_id"), col("text"))
        .join(winnersC2, Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("n_tokens"))
      time("FULL newC")(rest(exactC2))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
