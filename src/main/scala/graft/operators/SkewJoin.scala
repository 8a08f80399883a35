package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.4 watch-list: village→house
  * counts are Zipfian; at 100 TB one hot 小区ID would pin a whole
  * executor).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when the skew is known and extreme (a single key
  * larger than an executor), or when the join is followed by an
  * aggregation on the same key (AQE can't split that). Left rows get a
  * deterministic salt in [0, saltFactor); right rows are replicated
  * saltFactor× — join key becomes (key, salt), spreading each hot key
  * over saltFactor partitions.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt (hash of whole left row modulo factor) — no rand():
    // reruns and speculative retries must salt identically
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
