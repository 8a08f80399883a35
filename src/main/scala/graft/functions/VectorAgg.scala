package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator computing the element-wise mean (centroid) of an
  * embedding column (SURVEY §2.5 "custom" aggregate row).
  *
  * Buffer is one (sum-vector, count) pair per group per partition —
  * constant size in rows, so the partial/merge tree behaves exactly like
  * a built-in agg at any scale (map-side partials, one shuffle of
  * dim-sized buffers). The posexplode formulation (VectorQueries.q32)
  * shuffles rows×dim instead — this is the shape to prefer when dim is
  * large and groups are few.
  */
object VectorAgg {

  final case class CentroidBuf(var sums: Array[Double], var n: Long)

  val centroidAgg: Aggregator[Seq[Float], CentroidBuf, Seq[Double]] =
    new Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
      def zero: CentroidBuf = CentroidBuf(Array.empty, 0L)
      def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
        if (v == null) return b
        if (b.sums.isEmpty) b.sums = new Array[Double](v.length)
        var i = 0
        while (i < v.length && i < b.sums.length) { b.sums(i) += v(i); i += 1 }
        b.n += 1
        b
      }
      def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
        if (a.sums.isEmpty) return b
        if (b.sums.isEmpty) return a
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.n += b.n
        a
      }
      def finish(b: CentroidBuf): Seq[Double] =
        if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq
      def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
      def outputEncoder: Encoder[Seq[Double]] = org.apache.spark.sql.catalyst
        .encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Column form, usable in any untyped groupBy().agg(...). */
  def centroid(embedding: Column): Column = udaf(centroidAgg).apply(embedding)
}
