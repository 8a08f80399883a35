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

  /** Typed Aggregator form for pure-SQL callers (`graft_hll64`): the
    * buffer is the DENSE 64-register max-rank array, reduce computes
    * the SAME bucket/rank as the relational form (JVM MD5 ≡ Spark md5
    * ≡ DuckDB md5 — the portability anchor), merge is element-wise max
    * (the HLL union), finish returns the registers — state + estimate
    * derive from them exactly as q148 derives from the register table. */
  def agg: org.apache.spark.sql.expressions.Aggregator[String, Array[Int], Seq[Int]] =
    new org.apache.spark.sql.expressions.Aggregator[String, Array[Int], Seq[Int]] {
      import org.apache.spark.sql.Encoder
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      def zero: Array[Int] = new Array[Int](M)
      def reduce(buf: Array[Int], s: String): Array[Int] = {
        if (s != null) {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8"))
          val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
          val h = java.lang.Long.parseLong(hex, 16)
          val b = (h % M).toInt
          val rem = h >>> 6
          val r = if (rem == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
          if (r > buf(b)) buf(b) = r
        }
        buf
      }
      def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
        var i = 0
        while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
        a
      }
      def finish(buf: Array[Int]): Seq[Int] = buf.toSeq
      def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
      def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder[Seq[Int]]()
    }

  /** Driver-side estimate from a finished register array — the same
    * arithmetic as [[estimate]], for consumers of `graft_hll64`. */
  def estimateFromRegisters(regs: Seq[Int]): Double = {
    require(regs.length == M, s"expected $M registers, got ${regs.length}")
    val t = regs.map(m => 1L << (55 - m)).sum
    val v = regs.count(_ == 0)
    val eRaw = AlphaM2Pow55 / t
    if (eRaw <= 2.5 * M && v > 0) M * math.log(M.toDouble / v) else eRaw
  }
}
