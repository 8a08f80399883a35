package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged with null-safety") {
    val prev = Seq(
      (1L, Some(10.0), "A"),  // unchanged
      (2L, Some(20.0), "B"),  // price changes
      (3L, None,       "C"),  // null -> value: must read as changed
      (4L, Some(40.0), "D"))  // removed
      .toDF("k", "price", "st")
    val cur = Seq(
      (1L, Some(10.0), "A"),
      (2L, Some(21.0), "B"),
      (3L, Some(30.0), "C"),
      (5L, Some(50.0), "E"))  // added
      .toDF("k", "price", "st")
    val got = Diff.snapshotDiff(prev, cur, "k", Seq("price", "st"))
      .orderBy("k")
      .as[(Long, String, Seq[String])].collect().toSeq
    assert(got === Seq(
      (1L, "unchanged", Nil),
      (2L, "changed", Seq("price")),
      (3L, "changed", Seq("price")),
      (4L, "removed", Nil),
      (5L, "added", Nil)))
  }

  test("snapshotDiff reports every differing column, sorted") {
    val prev = Seq((1L, 1.0, "X")).toDF("k", "price", "st")
    val cur = Seq((1L, 2.0, "Y")).toDF("k", "price", "st")
    val got = Diff.snapshotDiff(prev, cur, "k", Seq("st", "price"))
      .select(col("changed_cols")).as[Seq[String]].head()
    assert(got === Seq("price", "st"))
  }

  test("snapshotDiff matches a null-keyed row across snapshots (no removed+added split)") {
    val prev = Seq((Option(1L), "A"), (None, "N1")).toDF("k", "st")
    val cur = Seq((Option(1L), "A"), (None, "N2")).toDF("k", "st")
    val got = Diff.snapshotDiff(prev, cur, "k", Seq("st"))
      .as[(Option[Long], String, Seq[String])].collect().toSet
    assert(got === Set(
      (Some(1L), "unchanged", Nil),
      (None, "changed", Seq("st"))))
  }

  test("snapshotDiff rejects key inside compared cols") {
    val df = Seq((1L, "A")).toDF("k", "st")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(df, df, "k", Seq("k", "st"))
    }
  }
}
