package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.sources.Tables

/** Phase-level timing for q83's duplicated-span coverage (not part of
  * the driver contract): span hashing (narrow) vs the per-hash count
  * window vs the interval-merge + rollup, to locate where its bench
  * seconds actually go.
  */
object DiagSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val k = 20
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val docs = Tables.documents(spark, sfDir)
      time("tokenize only") {
        docs.select(TextFns.tokens(col("text")).as("toks"))
          .select(sum(size(col("toks")))).collect()
      }
      val sp = docs
        .repartition(col("doc_id"))
        .select(col("doc_id").as("id"), TextFns.tokens(col("text")).as("toks"))
        .select(col("id"), when(size(col("toks")) >= k, transform(
          sequence(lit(1), size(col("toks")) - (k - 1)),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(k))))))
          .otherwise(array()).as("hs"))
        .select(col("id"), posexplode(col("hs")))
        .select(col("id"), (col("pos") + 1).as("s"), (col("pos") + k).as("e"),
          col("col").as("h"))
      time("span hash + explode")(println("  spans=" + sp.count()))
      import org.apache.spark.sql.expressions.Window
      val ds = sp
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("h"))))
        .filter(col("n") >= 2)
      time("+ per-hash count window")(println("  dup spans=" + ds.count()))
      val w = Window.partitionBy(col("id")).orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cov = ds
        .withColumn("prev_end", coalesce(max(col("e")).over(w), lit(0L)))
        .withColumn("c", greatest(col("e") - greatest(col("prev_end"), col("s") - 1), lit(0L)))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("dup_tokens"))
      time("+ interval merge + rollup")(println("  docs=" + cov.count()))
      time("registered q83 end-to-end") {
        graft.SparkEntry.queries("q83_dup_span_coverage")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
