package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** One registered engine query.
  *
  * @param name    stable key; becomes the `SparkEntry.queries` map key and
  *                the parquet dump name in `Verify`
  * @param oracle  equivalent ANSI SQL runnable by DuckDB over views named
  *                after the parquet tables; None ⇒ the operator is not
  *                SQL-expressible in DuckDB (driver falls back to a
  *                rows-only check)
  * @param run     the Spark-side implementation
  *
  * Determinism contract (both sides must respect it, or the driver's
  * hash-compare flakes):
  *  - every float that went through arithmetic is `round`ed to a fixed
  *    number of decimals in BOTH dialects;
  *  - every result has a total ORDER BY with a unique tiebreaker;
  *  - aggregate/computed columns carry identical aliases in both dialects
  *    (the driver sorts columns by name before hashing);
  *  - integer sums are cast to BIGINT in DuckDB (its `sum(int)` widens to
  *    HUGEINT, Spark's stays LongType).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), run)
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, None, run)

  /** Normalize IEEE signed zero after rounding: −0.0 + 0.0 = +0.0 (and
    * x + 0.0 = x for every other double, NaN included), so a rounded
    * value that lands within one ulp of zero hashes identically in both
    * engines. DuckDB's `round(tiny_negative, d)` preserves the sign
    * (−0.0) while Spark's `Round` (BigDecimal HALF_UP → toDouble)
    * returns +0.0 — any rounded output that can go negative must be
    * finished with this on the Spark side AND `+ 0.0` in the oracle SQL,
    * or a degenerate input diverges the driver's exact hash (round 9:
    * q194 heaps_beta on a β≈0 template corpus). Part of the determinism
    * contract documented on [[Q]]. */
  def noNegZero(c: Column): Column = c + lit(0.0d)
}
