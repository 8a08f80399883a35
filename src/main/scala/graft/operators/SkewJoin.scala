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

  /** @param saltCols columns whose hash spreads same-key rows across
    *                  salt buckets. Pass the row's natural identity
    *                  (e.g. the PK columns): the default — EVERY left
    *                  column — is always correct but forces the scan to
    *                  read all of them, defeating column pruning (a
    *                  16-column fact scan for a 3-column query; the
    *                  ReadSchema regression PlanSpec pins on q57). Any
    *                  column set works for correctness — the salt only
    *                  needs to VARY across a hot key's rows to spread
    *                  them; in the worst case (constant salt cols) the
    *                  join degrades to the unsalted plan, never to a
    *                  wrong answer. Deterministic (no rand()): reruns
    *                  and speculative retries must salt identically. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner",
      saltCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0)
    val idCols = if (saltCols.nonEmpty) saltCols else left.columns.toSeq
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(idCols.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
