package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PageRank
import graft.sources.Tables

/** Phase-level timing for q76's PageRank (not part of the driver
  * contract): edge construction vs the iterate loop (PageRank.run's
  * eager checkpoints mean run() returns only after every round has
  * executed) vs final sort+collect.
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

    val pairs = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct()
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("cn"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("sn"))
    val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
      .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst")))
      .cache()
    time("edges materialize")(println(s"  edges=${edges.count()}"))
    import spark.implicits._
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, "src")
      .withColumn("salt",
        pmod(hash($"dst"), greatest(ceil($"deg" / 65536), lit(1))).cast("int"))
      .groupBy($"src", $"salt")
      .agg(collect_list($"dst").as("dsts"), first($"deg").as("deg"))
      .drop("salt")
      .repartition($"src")
      .cache()
    time("adj materialize")(println(s"  adj=${adj.count()}"))
    val nNodes = adj.select($"src").distinct()
      .agg(count(lit(1)).cast("double").as("n_nodes"))
    val nodes = adj.select($"src".as("node")).distinct()
      .join(broadcast(nNodes))
      .cache()
    time("nodes materialize")(println(s"  nodes=${nodes.count()}"))
    var ranks = time("round 0")(nodes.select($"node", (lit(1.0) / $"n_nodes").as("pr"))
      .localCheckpoint(true))
    for (k <- 1 to 8) {
      ranks = time(s"round $k") {
        val inbound = adj.join(ranks, adj("src") === ranks("node"))
          .select(explode($"dsts").as("dst"), ($"pr" / $"deg").as("w"))
          .groupBy($"dst")
          .agg(sum($"w").as("mass"))
        nodes
          .join(inbound, nodes("node") === inbound("dst"), "left")
          .select($"node",
            (lit(0.15) / $"n_nodes" + lit(0.85) * coalesce($"mass", lit(0.0))).as("pr"))
          .localCheckpoint(true)
      }
    }
    time("final orderBy+collect")(println(s"  out=${ranks.orderBy(col("node")).collect().length}"))
    spark.stop()
  }
}
