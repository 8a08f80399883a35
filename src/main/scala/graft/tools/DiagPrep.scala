package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
object DiagPrep {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    val pairs = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date"))
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cn"), (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct().cache()
    time("pairs")(pairs.count())
    val edges = pairs.select($"cn".as("src"), $"sn".as("dst"))
      .unionAll(pairs.select($"sn".as("src"), $"cn".as("dst")))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    time("deg count")(deg.count())
    val joined = edges.join(deg.hint("shuffle_hash"), "src")
    val adj = joined
      .withColumn("salt", pmod(hash($"dst"), greatest(ceil($"deg" / 65536), lit(1))).cast("int"))
      .groupBy($"src", $"salt")
      .agg(collect_list($"dst").as("dsts"), first($"deg").as("deg"))
      .drop("salt").cache()
    time("adj count (cache pop)")(adj.count())
    time("adj count again")(adj.count())
    time("nNodes distinct count")(adj.select($"src").distinct().count())
    println(adj.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
