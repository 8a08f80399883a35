package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  /** JVM-side reference: same md5-bucket → weight → mean fold. */
  private def expected(text: String): Double = {
    val toks = text.toLowerCase.split("\\s+").toSeq
    val sum = toks.map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      QualityModel.weights((java.lang.Long.parseLong(hex, 16) % QualityModel.Dim).toInt)
    }.sum
    sum / toks.size + QualityModel.Bias
  }

  private def scored(text: String): Double =
    Seq(text).toDF("text")
      .select(QualityModel.score(TextFns.tokens(col("text")))).as[Double].head()

  test("score matches the reference fold bit-for-bit") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "spark window join filter group table scan",
      "single")
    samples.foreach(s => assert(scored(s) === expected(s)))
  }

  test("score is bounded by max |weight| + |bias|") {
    val bound = QualityModel.weights.map(math.abs).max + math.abs(QualityModel.Bias)
    assert(math.abs(scored("alpha beta gamma delta")) <= bound)
  }

  test("weights are reproducible and span both signs") {
    assert(QualityModel.weights.size === QualityModel.Dim)
    assert(QualityModel.weights.exists(_ > 0) && QualityModel.weights.exists(_ < 0))
    assert(QualityModel.weights === QualityModel.weights) // stable accessor
  }
}
