package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
