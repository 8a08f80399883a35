package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity of the native winnow expression against the declarative
  * two-transform formulation it replaced (the q44 oracle replays the
  * same md5 arithmetic in DuckDB, so parity here ⇒ oracle parity).
  */
class WinnowExprSpec extends SparkSpec {

  private def declarative(w: Int, k: Int) = {
    val gh = transform(sequence(lit(1), length(col("norm")) - (w - 1)),
      i => conv(substring(md5(col("norm").substr(i, lit(w))), 1, 15), 16, 10)
        .cast("long"))
    array_distinct(transform(
      sequence(lit(1), size(gh) - (k - 1)),
      j => array_min(slice(gh, j, lit(k)))))
  }

  test("native winnow ≡ declarative transform chain, incl. order") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa",
      "abc def abc def abc def ghi",
      "xyzzy plugh " * 40,
      "中文 字符 也 必须 一致 中文 字符",        // code-point-aware substr
      "exactly-eleven!"                           // npos == k boundary
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "norm")
    for ((w, k) <- Seq((8, 4), (5, 3), (4, 11))) {
      val rows = docs
        .filter(length(col("norm")) >= w + k - 1)
        .select(col("id"),
          WinnowExpr.winnow(col("norm"), w, k).as("native"),
          declarative(w, k).as("decl"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"mismatch at id=${r.getLong(0)} w=$w k=$k")
      }
    }
  }

  test("short input (no full window) yields an empty array") {
    import spark.implicits._
    val one = Seq((1L, "tiny")).toDF("id", "norm")
      .select(WinnowExpr.winnow(col("norm"), 8, 4).as("fp"))
      .head.getSeq[Long](0)
    assert(one.isEmpty)
  }
}
