package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way every graft
  * operator expects (UTC, AQE, sane local shuffle parallelism), plus SQL
  * registration of the engine's custom expressions so pure-SQL users get
  * the same surface as the DataFrame API.
  */
object GraftSession {

  /** Build a local session. `cores` drives both the master thread count
    * and shuffle partitions — on a real cluster, drop `master` and size
    * `spark.sql.shuffle.partitions` to ~2-3× total executor cores. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    registerFunctions(spark)
    spark
  }

  /** Register graft's custom expressions in the session's function
    * registry: `SELECT graft_simhash64(tokens) FROM ...` from plain SQL.
    * Same function set as the `GraftExtensions` session-extension entry
    * point (which covers spark-submit-time installation); this covers
    * already-running sessions. */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** Register every testdata table from `dir` as a temp view, so the
    * whole engine surface is reachable from `spark.sql(...)` alone. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      graft.sources.Tables.byName(spark, dir, t).createOrReplaceTempView(t)
    }
}
