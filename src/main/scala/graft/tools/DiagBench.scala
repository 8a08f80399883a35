package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Targeted re-timer: times only the queries whose names contain one of
  * the given substrings, interleaving reps so co-tenant contention hits
  * every variant equally (the full Bench's min-of-2 can't distinguish a
  * regression from a noisy window — box timings vary 2-10×).
  *
  * Usage: runMain graft.tools.DiagBench <sfDir> <reps> <substr>[,<substr>...]
  */
object DiagBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val subs = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Bench's sizing so targeted re-timings stay representative
      // (SPARK_GRAFT_CODEGEN_CACHE=100 reproduces the default-cache
      // thrash for A/B)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subs.exists(n.contains) }
    val times = scala.collection.mutable.Map[String, List[Double]]()
    for (_ <- 1 to reps; (name, fn) <- picked) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = dt :: times.getOrElse(name, Nil)
    }
    picked.foreach { case (name, _) =>
      val ts = times(name).reverse
      println(f"$name%-32s min ${ts.min}%6.2f  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
