package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing diagnostics (not part of the driver contract).
  * Runs the named SparkEntry queries (args) N times each under the same
  * session config as Bench.
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[diag] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (name <- names; i <- 1 to reps)
      time(s"$name run$i")(graft.SparkEntry.queries(name)(spark, sfDir).count())
    spark.stop()
  }
}
