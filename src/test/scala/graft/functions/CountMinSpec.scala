package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 4
  private val Width = 64
  private val P = Dedup.MinhashP
  private lazy val params = Dedup.minhashParams(Depth)

  // Zipf-ish corpus: token i appears ~200/i times
  private lazy val items: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(200 / i)(s"tok$i"))

  private def sketchOf(xs: Seq[String]): Array[Long] = {
    val a = CountMin.agg(Depth, Width, params, P)
    var buf = a.zero
    xs.foreach(s => buf = a.reduce(buf, CountMin.keyHash(s, P)))
    buf
  }

  test("estimates never undercount, and exact counts dominate the sketch") {
    val buf = sketchOf(items)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (tok, n) =>
      val est = (0 until Depth).map(r =>
        buf(r * Width + CountMin.keyBucket(tok, r, Width, params, P))).min
      assert(est >= n, s"$tok undercounted: est $est < true $n")
      // CMS bound: over by at most N (trivial) — sanity-bound with N/width*depth slack
      assert(est <= n + items.size.toLong, s"$tok absurd estimate $est")
    }
  }

  test("merge of partial sketches equals the sketch of the union") {
    val (l, r) = items.splitAt(items.size / 3)
    val a = CountMin.agg(Depth, Width, params, P)
    val merged = a.merge(sketchOf(l), sketchOf(r))
    assert(merged.toSeq === sketchOf(items).toSeq)
  }

  test("keyHash matches the portable md5 column hash") {
    val keys = Seq("join", "hash", "中文", "a b", "")
    val fromCol = keys.toDF("k")
      .select(Dedup.portableShingleHash(col("k")).as("x"))
      .as[Long].collect().toSeq
    assert(fromCol === keys.map(CountMin.keyHash(_, P)))
  }

  test("Spark-side sketch aggregation matches the driver-side reference") {
    val buf = sketchOf(items)
    val got = items.toDF("tok")
      .repartition(7) // force multiple partials → merge path
      .select(Dedup.portableShingleHash(col("tok")).as("x"))
      .agg(CountMin.sketch(col("x"), Depth, Width, params, P).as("sk"))
      .as[Seq[Long]].head()
    assert(got === buf.toSeq)
  }
}
