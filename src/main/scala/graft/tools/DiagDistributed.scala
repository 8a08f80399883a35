package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.operators.PageRank

/** Wall-clocks the DISTRIBUTED paths of the size-gated graph operators
  * (r7 verdict missing-item #2: at sf0.1 every gated query takes the
  * driver-local path, so the code that would actually run at 100× scale
  * was spec-verified — IterateSpec/PageRankSpec parity — but never
  * timed; a regression in a distributed loop would be invisible until a
  * big graph arrived).
  *
  * Runs each gated query twice per rep in ONE JVM — once normally
  * (local path) and once with [[PageRank.GateOverrideProp]] forcing the
  * gate to 0 (distributed loops) — interleaved so box noise hits both
  * variants equally. Emits one JSON line per query with min seconds for
  * both paths and the ratio; the artifact is committed as
  * `DIAG_DISTRIBUTED_r{N}.json`.
  *
  * Usage: runMain graft.tools.DiagDistributed <sfDir> [reps]
  */
object DiagDistributed {

  /** Every registered query whose operator is size-gated. */
  val Targets = Seq(
    "q76_pagerank", "q112_personalized_pagerank", "q126_hits_authorities",
    "q127_crawl_depth", "q131_cheapest_paths", "q132_kcore_peel",
    "q80_triangle_census")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config(graft.sources.Tables.NanosAsLongKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => Targets.contains(n) }
    val local = scala.collection.mutable.Map[String, List[Double]]()
    val dist = scala.collection.mutable.Map[String, List[Double]]()
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to reps; (name, fn) <- picked) {
      local(name) = time(fn) :: local.getOrElse(name, Nil)
      sys.props(PageRank.GateOverrideProp) = "0"
      try dist(name) = time(fn) :: dist.getOrElse(name, Nil)
      finally sys.props.remove(PageRank.GateOverrideProp)
      System.err.println(f"[diag] rep $r $name local=${local(name).head}%.2f " +
        f"dist=${dist(name).head}%.2f")
    }
    val entries = picked.map { case (name, _) =>
      val (l, d) = (local(name).min, dist(name).min)
      f"""    "$name": {"local_sec": $l%.2f, "distributed_sec": $d%.2f, "ratio": ${d / l}%.2f}"""
    }
    println("{\n  \"sf_dir\": \"" + sfDir + "\", \"reps\": " + reps +
      ", \"queries\": {\n" + entries.mkString(",\n") + "\n  }\n}")
    spark.stop()
  }
}
