package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PageRank
import graft.sources.Tables

/** Phase-level timing for q76's PageRank (not part of the driver
  * contract): graph prepare (adjacency collapse + caches) vs each
  * power-iteration round (checkpointed eagerly here so every round is
  * individually timed) vs final sort+collect. Uses the production
  * PageRank.prepare/round path.
  */
object DiagPageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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

    import spark.implicits._
    val pairs = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date"))
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cn"), (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
      .cache()
    time("pairs materialize")(println(s"  pairs=${pairs.count()}"))
    val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
      .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst")))

    val g = time("prepare (adj+nodes+count)")(PageRank.prepare(edges))
    println(s"  nNodes=${g.nNodes}")
    var ranks = time("round 0 (init ckpt)")(
      g.nodes.select($"node", (lit(1.0) / $"n_nodes").as("pr")).localCheckpoint(true))
    for (k <- 1 to 8) {
      ranks = time(s"round $k")(
        PageRank.round(g, ranks, 0.85, lit(0.15) / $"n_nodes").localCheckpoint(true))
    }
    time("final orderBy+collect")(println(s"  out=${ranks.orderBy(col("node")).collect().length}"))
    g.release()
    spark.stop()
  }
}
