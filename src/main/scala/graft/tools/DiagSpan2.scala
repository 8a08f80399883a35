package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.sources.Tables

/** A/B variants for q83's span-hash inner loop (not part of the driver
  * contract): per-span string building vs hashing array slices directly
  * vs pre-hashed token arrays.
  */
object DiagSpan2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val k = 20
    def spansWith(body: Column => Column): Long = {
      Tables.documents(spark, sfDir)
        .repartition(col("doc_id"))
        .select(col("doc_id").as("id"), TextFns.tokens(col("text")).as("toks"))
        .select(col("id"), when(size(col("toks")) >= k, body(col("toks")))
          .otherwise(array()).as("hs"))
        .select(col("id"), posexplode(col("hs")))
        .agg(count(lit(1)), sum(hash(col("col")))).count()
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("A: concat_ws string (current)") {
        spansWith(toks => transform(sequence(lit(1), size(toks) - (k - 1)),
          i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))
      }
      time("B: xxhash64(slice) direct") {
        spansWith(toks => transform(sequence(lit(1), size(toks) - (k - 1)),
          i => xxhash64(slice(toks, i, lit(k)))))
      }
      time("C: pre-hash tokens, hash slices") {
        spansWith { toks =>
          val th = transform(toks, t => xxhash64(t))
          transform(sequence(lit(1), size(th) - (k - 1)),
            i => xxhash64(slice(th, i, lit(k))))
        }
      }
      time("D: explode positions, codegen hash") {
        Tables.documents(spark, sfDir)
          .repartition(col("doc_id"))
          .select(col("doc_id").as("id"), TextFns.tokens(col("text")).as("toks"))
          .select(col("id"), col("toks"),
            explode(when(size(col("toks")) >= k,
              sequence(lit(1), size(col("toks")) - (k - 1)))
              .otherwise(array())).as("pos"))
          .select(col("id"), col("pos"),
            xxhash64(concat_ws(" ", slice(col("toks"), col("pos"), lit(k)))).as("h"))
          .agg(count(lit(1)), sum(hash(col("h")))).count()
      }
    }
    spark.stop()
  }
}
