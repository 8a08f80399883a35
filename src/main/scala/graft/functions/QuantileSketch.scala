package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable equi-width histogram QUANTILE sketch — the quantile member
  * of the engine's sketch family (count-min for frequencies, HLL for
  * distincts, Misra-Gries for heavy hitters). State is `nBins` longs per
  * group regardless of value cardinality; partials merge by vector add,
  * so map-side combine applies and the shuffle carries one small array
  * per group — an exact grouped percentile instead shuffles or sorts
  * value-scale data (q14's plan), which is the 100 TB trade this sketch
  * exists to make.
  *
  * Determinism (the q96 count-min property applied to quantiles): bin
  * assignment is INTEGER arithmetic — `floorDiv(x − lo, width)` clamped
  * to [0, nBins) — and the estimate for quantile q is the MIDPOINT of
  * the bin holding rank ⌈q·n⌉, also an integer. The sketch is therefore
  * a pure function of the input multiset and every estimate is exactly
  * reproducible by a relational twin (q134's oracle replays the bin and
  * rank arithmetic in SQL), while the guarantee |estimate − exact
  * quantile| ≤ width/2 holds by construction: the rank-th smallest
  * value lies inside the holding bin.
  *
  * Values outside [lo, lo + nBins·width) clamp into the edge bins —
  * part of the contract, mirrored by the oracle; size the range so the
  * clamp is the exception, or widen `width` (the error bound scales
  * with it).
  */
object QuantileSketch {

  /** Histogram aggregator over long-valued inputs (nulls ignored).
    * Buffer/output: nBins counts. */
  def agg(lo: Long, width: Long, nBins: Int):
      Aggregator[java.lang.Long, Array[Long], Seq[Long]] = {
    require(width > 0 && nBins > 0, s"need width > 0, nBins > 0; got $width, $nBins")
    new Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
      def zero: Array[Long] = new Array[Long](nBins)
      def reduce(buf: Array[Long], x: java.lang.Long): Array[Long] = {
        if (x != null) {
          val bin = Math.floorDiv(x - lo, width)
          buf(math.min(math.max(bin, 0L), (nBins - 1).toLong).toInt) += 1L
        }
        buf
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
  }

  /** Column form: ARRAY<BIGINT> of bin counts for a long-valued column. */
  def sketch(value: Column, lo: Long, width: Long, nBins: Int): Column =
    udaf(agg(lo, width, nBins)).apply(value)

  /** Driver-side estimate from a finished sketch: midpoint of the bin
    * holding 1-based rank ⌈q·n⌉ — the reference the relational form and
    * the oracle must both reproduce. Returns None for an empty sketch. */
  def estimate(counts: Seq[Long], q: Double, lo: Long, width: Long): Option[Long] = {
    val n = counts.sum
    if (n <= 0) return None
    val rank = math.ceil(q * n).toLong
    var cum = 0L
    var i = 0
    while (i < counts.length) {
      cum += counts(i)
      if (cum >= rank) return Some(lo + i * width + width / 2)
      i += 1
    }
    Some(lo + (counts.length - 1) * width + width / 2)
  }
}
