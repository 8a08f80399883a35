package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named queries under the SAME
  * session configuration Bench uses (master local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, nanos flag), so committed plan artifacts
  * (plans/r15/) reflect the plans the bench actually executes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.DiagExplain q85_... [q...]
  * SPARK_GRAFT_EXEC=1 executes first and prints the FINAL adaptive plan.
  */
object DiagExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config(graft.sources.Tables.NanosAsLongKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    args.foreach { name =>
      println(s"========== $name ==========")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (exec) df.collect()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
