package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.sources.Tables

/** Ad-hoc plan/timing diagnostics (not part of the driver contract). */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100).count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[diag] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for")

    time("baseline count")(docs.count())
    time("n_tokens only")(
      docs.withColumn("n_tokens", TextFns.tokenCount(col("text")))
        .filter(col("n_tokens").between(10, 5000)).count())
    time("punct only")(
      docs.withColumn("p", TextFns.punctRatio(col("text"))).filter(col("p") < 0.2).count())
    time("stop_ratio only")(
      docs.withColumn("s", TextFns.stopwordRatio(col("text"), Stopwords))
        .filter(col("s") >= 0.02).count())
    time("markerHits only")(
      docs.withColumn("h", TextFns.markerHits(TextFns.tokens(col("text")), Stopwords))
        .filter(col("h") > 0).count())
    for (i <- 1 to 5)
      time(s"full q25 run$i")(graft.queries.TextQueries.q25QualityFilter.run(spark, sfDir).count())

    // restructured: tokens materialized once, stages separated
    def restructured() = {
      val scored = docs
        .select(col("source"), col("text"), TextFns.tokens(col("text")).as("toks"))
        .select(col("source"),
          size(col("toks")).as("n_tokens"),
          TextFns.punctRatio(col("text")).as("punct_ratio"),
          (TextFns.markerHits(col("toks"), Stopwords).cast("double") /
            greatest(size(col("toks")), lit(1))).as("stop_ratio"))
      scored.filter(col("n_tokens").between(10, 5000)
          && col("punct_ratio") < 0.2 && col("stop_ratio") >= 0.02)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), round(avg(col("stop_ratio")), 4).as("avg_stop_ratio"))
    }
    for (i <- 1 to 5) time(s"restructured run$i")(restructured().count())
    spark.stop()
  }
}
