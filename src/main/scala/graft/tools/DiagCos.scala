package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Microbenchmark: HOF (zip_with/aggregate) cosine vs candidate
  * implementations, on 2M synthetic 64-dim vectors (cached, so only the
  * similarity math is timed). Not part of the driver contract. */
object DiagCos {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 2000000L
    val vec = transform(sequence(lit(1), lit(64)),
      i => sin((col("id") + 1) * i).cast("double"))
    val df = spark.range(n).select(col("id"), vec.as("a"),
      transform(sequence(lit(1), lit(64)), i => cos(col("id") + i).cast("double")).as("b"))
      .persist()
    df.count()

    def time(label: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[cos] $label run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }

    time("HOF cosine")(
      df.select(sum(VectorFns.cosineHof(col("a"), col("b")))).collect())
    time("native cosine")(
      df.select(sum(VectorFns.cosine(col("a"), col("b")))).collect())
    spark.stop()
  }
}
