package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the named queries (plan review
  * tooling, not part of the driver contract). */
object DiagPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXEC=1: execute first and print the FINAL adaptive
    // plan — AQE stage reuse (shared exchanges) only shows up there,
    // the pre-execution plan prints every consumer's subtree verbatim
    val exec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    args.foreach { name =>
      println(s"========== $name ==========")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (exec) df.collect() // collect() drives df's OWN queryExecution
      // (count() would wrap a new plan and leave this one un-executed)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
