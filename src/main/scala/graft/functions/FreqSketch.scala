package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitter summary as a typed Aggregator — bounded-
  * memory "top tokens" at any scale.
  *
  * The buffer holds at most k counters regardless of input size; any
  * item with true count > N/k is guaranteed to survive, and every kept
  * estimate undercounts its true count by at most N/k. Partial buffers
  * merge associatively (sum counters, then subtract the (k+1)-largest
  * count and drop non-positives — the mergeable-summaries construction,
  * Agarwal et al., PODS'12), so the partial/merge tree behaves like a
  * built-in agg: map-side partials, one shuffle of k-sized buffers.
  * Exact per-token counting of a 100 TB corpus shuffles the full token
  * vocabulary; this shuffles k counters per group.
  *
  * The surviving SET near the N/k boundary depends on encounter order —
  * inherent to the sketch — so queries built on it are rows-only checked
  * while FreqSketchSpec asserts the mathematical guarantees.
  */
object FreqSketch {

  final case class MGBuf(var items: Map[String, Long])

  def misraGriesAgg(k: Int): Aggregator[String, MGBuf, Map[String, Long]] =
    new Aggregator[String, MGBuf, Map[String, Long]] {
      def zero: MGBuf = MGBuf(Map.empty)

      def reduce(b: MGBuf, item: String): MGBuf = {
        if (item == null) return b
        b.items.get(item) match {
          case Some(n) => b.items = b.items.updated(item, n + 1)
          case None if b.items.size < k => b.items = b.items.updated(item, 1L)
          case None =>
            // decrement-all: drop one "vote" from every counter
            b.items = b.items.flatMap { case (t, n) =>
              if (n > 1) Some(t -> (n - 1)) else None
            }
        }
        b
      }

      def merge(a: MGBuf, b: MGBuf): MGBuf = {
        if (b.items.isEmpty) return a
        if (a.items.isEmpty) return b
        var m = a.items
        b.items.foreach { case (t, n) => m = m.updated(t, m.getOrElse(t, 0L) + n) }
        if (m.size > k) {
          // subtract the (k+1)-th largest count from everything
          val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
          m = m.flatMap { case (t, n) => if (n > cut) Some(t -> (n - cut)) else None }
        }
        a.items = m
        a
      }

      def finish(b: MGBuf): Map[String, Long] = b.items

      def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
      def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }

  /** Column form: MAP<STRING,BIGINT> of surviving (item, estimate). */
  def heavyHitters(item: Column, k: Int): Column = udaf(misraGriesAgg(k)).apply(item)
}
