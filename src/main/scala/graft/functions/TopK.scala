package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-per-group as a mergeable typed Aggregator.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * s DESC) <= k`) shuffles and SORTS every row of every group; this
  * aggregator keeps a k-element buffer per group, so the map-side
  * partial trims each partition's contribution to k rows BEFORE the
  * exchange — the shuffle carries at most k·partitions rows per group
  * instead of the group's full population, and nothing is ever globally
  * sorted. At 100 TB the difference is a full-corpus sort-exchange vs a
  * k-row-per-task one.
  *
  * Total order: score DESC, then id ASC — ties are deterministic, so
  * the result is EXACTLY the window formulation's first k rows and the
  * DuckDB oracle can mirror it with row_number.
  */
object TopK {

  final case class SI(s: Double, i: Long)

  def topKAgg(k: Int): Aggregator[SI, Seq[SI], Seq[SI]] =
    new Aggregator[SI, Seq[SI], Seq[SI]] {
      private def trim(xs: Seq[SI]): Seq[SI] =
        xs.sortBy(t => (-t.s, t.i)).take(k)
      def zero: Seq[SI] = Vector.empty
      def reduce(buf: Seq[SI], x: SI): Seq[SI] =
        // fast reject: full buffer and x is worse than the current worst
        if (buf.length == k && {
          val w = buf.last
          x.s < w.s || (x.s == w.s && x.i > w.i)
        }) buf
        else trim(buf :+ x)
      def merge(a: Seq[SI], b: Seq[SI]): Seq[SI] =
        if (a.isEmpty) b else if (b.isEmpty) a else trim(a ++ b)
      def finish(buf: Seq[SI]): Seq[SI] = buf
      def bufferEncoder: Encoder[Seq[SI]] = ExpressionEncoder[Seq[SI]]()
      def outputEncoder: Encoder[Seq[SI]] = ExpressionEncoder[Seq[SI]]()
    }

  /** Column form: ARRAY<STRUCT<s: DOUBLE, i: BIGINT>> of the k best
    * (score DESC, id ASC) rows of the group. */
  def topK(score: Column, id: Column, k: Int): Column =
    udaf(topKAgg(k)).apply(score.cast("double"), id.cast("long"))
}
