package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens lowercases and splits on whitespace runs") {
    val got = Seq("The  Quick\tbrown\nFOX").toDF("t")
      .select(TextFns.tokens(col("t"))).as[Seq[String]].head()
    assert(got === Seq("the", "quick", "brown", "fox"))
  }

  test("shingles produces n-grams; short docs yield empty, not descending-sequence garbage") {
    val df = Seq("a b c d", "a b", "").toDF("t")
      .select(TextFns.shingles(TextFns.tokens(col("t")), 3).as("s"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty) // 2 tokens < n=3 — the sequence(1,0) guard
    assert(got(2) === Seq.empty)
  }

  test("shinglePositions+shingleAt (codegen shape) ≡ shingles (HOF shape)") {
    val texts = Seq("a b c d e f", "a b", "", "x y z", "one two three four")
    for (n <- Seq(2, 3, 4)) {
      val hof = texts.toDF("t")
        .select(TextFns.shingles(TextFns.tokens(col("t")), n).as("s"))
        .as[Seq[String]].collect().toSeq
      val narrow = texts.toDF("t")
        .select(TextFns.tokens(col("t")).as("toks"))
        .select(col("toks"),
          explode_outer(TextFns.shinglePositions(col("toks"), n)).as("i"))
        .select(when(col("i").isNotNull,
          TextFns.shingleAt(col("toks"), col("i"), n)).as("sh"))
        .as[Option[String]].collect().toSeq
      // every HOF shingle appears, in order, in the exploded stream
      assert(narrow.flatten === hof.flatten, s"n=$n")
      // short/empty docs contribute a single null row, no garbage
      // shingles (split("") yields [""] — one token, still < n)
      assert(narrow.count(_.isEmpty) ===
        texts.count(_.split("\\s+").length < n), s"n=$n nulls")
    }
  }

  test("punctRatio and stopwordRatio") {
    val df = Seq("the cat, the hat!").toDF("t")
    val (p, s) = df.select(
      TextFns.punctRatio(col("t")),
      TextFns.stopwordRatio(col("t"), Seq("the", "a"))).as[(Double, Double)].head()
    assert(math.abs(p - 2.0 / 17.0) < 1e-12) // ',' and '!' counted
    assert(math.abs(s - 2.0 / 4.0) < 1e-12)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val got = Seq(("A  b\tC", "a b c", "a b d")).toDF("x", "y", "z")
      .select(TextFns.fingerprint(col("x")), TextFns.fingerprint(col("y")),
        TextFns.fingerprint(col("z")))
      .as[(String, String, String)].head()
    assert(got._1 === got._2)
    assert(got._1 !== got._3)
  }

  test("simhash: identical texts collide, near texts are close, distinct texts differ") {
    val df = Seq(
      ("a", "spark window join filter group table scan merge"),
      ("b", "spark window join filter group table scan merge"),
      ("c", "spark window join filter group table scan hash"),
      ("d", "completely different words entirely unrelated content here now")
    ).toDF("id", "t").select(col("id"), TextFns.simhash64(TextFns.tokens(col("t"))).as("h"))
    val m = df.as[(String, Long)].collect().toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(m("a") === m("b"))
    assert(ham(m("a"), m("c")) < ham(m("a"), m("d")))
  }
}
