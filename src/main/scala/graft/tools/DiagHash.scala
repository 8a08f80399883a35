package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark: the conv(substring(md5)) portable-hash chain vs
  * candidate implementations, on 4M short strings. */
object DiagHash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(4000000L)
      .select(concat(lit("tok"), col("id")).as("s")).persist()
    df.count()

    def time(label: String)(f: => Any): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[hash] $label run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }

    time("conv-substring-md5 chain")(
      df.select(sum(conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long") % 1000)).collect())
    time("md5 only")(
      df.select(sum(length(md5(col("s"))))).collect())
    spark.stop()
  }
}
