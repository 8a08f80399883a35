package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog (Flajolet et al. 2007), m = 64 registers —
  * the approximate-distinct sketch whose ENTIRE state is engine-portable
  * and therefore oracle-checkable (q148), unlike the native
  * `approx_count_distinct`/DataSketches families whose hash seeds are
  * engine-private (q38/q105, rows-only by necessity).
  *
  * Derivation, shared verbatim by the DuckDB oracle SQL:
  *  - h   = first 60 bits of md5(item), the repo-wide portable hash;
  *  - b   = h % 64 (register index), rem = h >> 6 (54-bit suffix);
  *  - rank = leading zeros of rem + 1 = 55 − length(bin(rem)), the
  *    bin()-string-length idiom both engines evaluate identically;
  *  - register M_b = max rank seen — a MAX aggregate, so the register
  *    table is mergeable map-side, order-independent, and (in streaming
  *    complete mode) a legal grouped state;
  *  - Σ 2^(−M_j) is carried SCALED BY 2^55 as a BIGINT: every term is an
  *    exact power of two, so the register sum is integer arithmetic —
  *    bit-stable under any addition order, hash-gateable;
  *  - estimate = α·m²·2^55 / T with the linear-counting branch below
  *    E ≤ 2.5m — one double expression over exact integers.
  *
  * Scale: the shuffle target is ≤ 64 rows per group whatever the input
  * cardinality — the mergeable-sketch contract (union across shards /
  * days / engines = element-wise register max).
  */
object PortableHll {

  /** Registers per group. */
  val M = 64

  /** α_64 · 64² · 2^55, precomputed to the exact double both engines
    * parse from this literal (α_m = 0.7213 / (1 + 1.079/m)). */
  val AlphaM2Pow55 = 1.046802484394006e20

  /** Register index (0..63) from the portable 60-bit md5 hash. */
  def bucket(item: Column): Column =
    (conv(substring(md5(item), 1, 15), 16, 10).cast("long") % M).as("b")

  /** Rank = leading zeros of the 54-bit hash suffix + 1 (1..55). */
  def rank(item: Column): Column = {
    val rem = shiftright(conv(substring(md5(item), 1, 15), 16, 10).cast("long"), 6)
    when(rem === 0, lit(55)).otherwise(lit(55) - length(bin(rem)))
  }

  /** (group, b, m) register table — ONE max-aggregate, mergeable
    * map-side, and a legal streaming complete-mode state. Registers a
    * group never touched are absent (dense 64-register state is
    * restored by [[state]]'s spine join). */
  def registers(items: DataFrame, groupCol: String, item: Column): DataFrame =
    items
      .select(col(groupCol), bucket(item), rank(item).as("r"))
      .groupBy(col(groupCol), col("b"))
      .agg(max(col("r")).as("m"))

  /** Collapse a register table to (group, t_scaled, v_zero): the
    * BIGINT-exact scaled register sum T = Σ 2^(55−M_j) (absent
    * registers contribute 2^55) and the zero-register count. `groups`
    * supplies the group spine (one row per group). */
  def state(reg: DataFrame, groups: DataFrame, groupCol: String): DataFrame = {
    val spine = groups
      .select(col(groupCol), explode(sequence(lit(0L), lit((M - 1).toLong))).as("b"))
    spine.join(reg, Seq(groupCol, "b"), "left")
      .select(col(groupCol), coalesce(col("m"), lit(0)).as("m"))
      .groupBy(col(groupCol))
      .agg(sum(expr("shiftleft(1L, 55 - m)")).as("t_scaled"),
        sum(when(col("m") === 0, 1L).otherwise(0L)).as("v_zero"))
  }

  /** Cardinality estimate from the exact integer state — identical
    * double expression in the oracle dialect (linear counting below
    * E ≤ 2.5m when empty registers remain). */
  def estimate(tScaled: Column, vZero: Column): Column = {
    val eRaw = lit(AlphaM2Pow55) / tScaled
    when(eRaw <= lit(2.5 * M) && vZero > 0,
      lit(M) * log(lit(M.toDouble) / vZero)).otherwise(eRaw)
  }
}
