package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PageRank
import graft.sources.Tables

/** Interleaved A/B of PageRank checkpoint cadence (every round vs every
  * 2nd round) on the q76 graph — interleaving makes co-tenant noise hit
  * both variants equally. Not part of the driver contract. */
object DiagPrAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val recent = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
    val pairs = recent
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      .cache()
    edges.count()

    for (rep <- 1 to 3; ce <- Seq(1, 2, 4)) {
      val t0 = System.nanoTime()
      // localEdgeLimit = 0: this diagnostic A/Bs the DISTRIBUTED loop's
      // checkpoint cadence, so the driver-local gate must not engage
      PageRank.run(edges, 8, checkpointEvery = ce, localEdgeLimit = 0).count()
      println(f"[ab] rep $rep checkpointEvery=$ce ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
