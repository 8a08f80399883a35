package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable typed
  * Aggregator — approximate per-key frequencies in depth×width longs of
  * state, regardless of vocabulary size.
  *
  * Exact token counting of a 100 TB corpus shuffles the full vocabulary;
  * this shuffles one depth×width buffer per group (8 KB at 4×256) with
  * map-side partials, and estimates are `min` over the depth rows:
  * always ≥ the true count, over by at most ≈ N·e/width with
  * probability 1 − e^-depth.
  *
  * Determinism: the sketch state is a pure function of the multiset of
  * inputs (counter increments commute), so — unusually for a sketch —
  * every estimate is EXACTLY reproducible by a relational twin that
  * mirrors the hash family: the input is the portable 60-bit md5 hash
  * (Dedup.portableHash60 mod P), and row r's bucket is
  * ((a_r·x + b_r) mod P) mod width with the (a, b) constants shared
  * between both dialects. Integer arithmetic end-to-end — no fp drift.
  */
object CountMin {

  /** CMS aggregator over pre-hashed inputs x ∈ [0, p). Buffer layout:
    * row-major depth×width counts. */
  def agg(depth: Int, width: Int, params: Seq[(Long, Long)], p: Long):
      Aggregator[java.lang.Long, Array[Long], Seq[Long]] = {
    require(params.length >= depth, s"need $depth affine params")
    val ab = params.take(depth).toArray
    new Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
      def zero: Array[Long] = new Array[Long](depth * width)
      def reduce(buf: Array[Long], x: java.lang.Long): Array[Long] = {
        if (x != null) {
          var r = 0
          while (r < depth) {
            val (a, b) = ab(r)
            buf(r * width + (((a * x + b) % p) % width).toInt) += 1L
            r += 1
          }
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

  /** Column form: ARRAY<BIGINT> sketch of the pre-hashed input column. */
  def sketch(hash: Column, depth: Int, width: Int, params: Seq[(Long, Long)],
      p: Long): Column =
    udaf(agg(depth, width, params, p)).apply(hash)

  /** The portable base hash of a string key, computed driver-side:
    * first 60 bits of md5 (hex chars 1-15) mod p — identical to
    * Dedup.portableHash60 % p and to the oracle's
    * ('0x' || substr(md5(s), 1, 15))::BIGINT % p. */
  def keyHash(key: String, p: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % p
  }

  /** Row-r bucket of a key — driver-side mirror of the aggregator's
    * bucket arithmetic, for building estimate lookups over literals. */
  def keyBucket(key: String, r: Int, width: Int, params: Seq[(Long, Long)],
      p: Long): Int = {
    val (a, b) = params(r)
    (((a * keyHash(key, p) + b) % p) % width).toInt
  }
}
