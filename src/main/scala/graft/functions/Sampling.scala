package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling (training-data pipelines need
  * STABLE splits: re-running the pipeline, or running it on a different
  * engine, must select the same rows — `TABLESAMPLE`/`df.sample` are
  * seed+partition dependent and reproduce on neither count).
  *
  * The selector hashes the row's key with md5 (identical everywhere) and
  * keeps rows whose hash bucket falls below the requested percentage. A
  * derived split column ("train"/"test"/...) is the same idea with range
  * boundaries.
  */
object Sampling {

  /** 0..99 bucket from the first 60 bits of md5 of the key's string form. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % 100

  /** Keep ~pct% of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Assign each row a stable split label by key: boundaries are
    * cumulative percentages, e.g. Seq(("train", 80), ("test", 100)). */
  def splitColumn(key: Column, boundaries: Seq[(String, Int)]): Column = {
    val b = hashBucket(key)
    boundaries.sortBy(_._2).foldRight(lit(null).cast("string")) {
      case ((name, hi), rest) => when(b < hi, name).otherwise(rest)
    }
  }
}
