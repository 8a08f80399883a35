package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the executed plan of named SparkEntry queries (not part of the
  * driver contract) — for counting exchanges / checking pins before
  * writing PlanSpec assertions.
  */
object DiagPlan2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // drive THIS df's QueryExecution so AQE finalizes it
                   // (count() would execute a different wrapped plan)
      val p = df.queryExecution.executedPlan.toString
      println(s"===== $name")
      println(p)
      println(s"--- exchanges=${"Exchange hashpartitioning".r.findAllIn(p).length}" +
        s" smj=${"SortMergeJoin".r.findAllIn(p).length}" +
        s" lambda=${"lambdafunction".r.findAllIn(p).length}")
    }
    spark.stop()
  }
}
