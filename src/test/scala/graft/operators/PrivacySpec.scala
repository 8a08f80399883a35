package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the shared k-anonymity fold (q215 + the streaming
  * monitor). The load-bearing property is the additive-under-union
  * contract: audit() must canonicalize a UNION of classState deltas
  * before counting l-diversity, or duplicate (QI, sensitive) rows
  * inflate the floor and a release gate passes a leaking table.
  */
class PrivacySpec extends SparkSpec {

  test("audit over a UNION of classState deltas ≡ audit over one batch") {
    import spark.implicits._
    val qi = Seq("nat", "band")
    val batch1 = Seq((1, 0L, "A"), (1, 0L, "A"), (1, 0L, "B"), (2, 1L, "A"))
    val batch2 = Seq((1, 0L, "A"), (2, 1L, "A"), (2, 1L, "A"))
    val unioned = Privacy.classState(batch1.toDF("nat", "band", "seg"), qi, "seg")
      .union(Privacy.classState(batch2.toDF("nat", "band", "seg"), qi, "seg"))
    val once = Privacy.classState(
      (batch1 ++ batch2).toDF("nat", "band", "seg"), qi, "seg")
    val a = Privacy.audit(unioned, qi, "nat").collect().map(_.toSeq).toSeq
    val b = Privacy.audit(once, qi, "nat").collect().map(_.toSeq).toSeq
    assert(a === b, "union of deltas diverged from the one-shot state")
    // the leak the canonicalization prevents: nation 1's class has
    // sensitive values {A, B} → l-diversity 2, NOT 3 (A appears in
    // both deltas and must not double-count)
    val n1 = Privacy.audit(unioned, qi, "nat")
      .filter(col("nat") === 1).head()
    assert(n1.getLong(7) === 2L, s"l_div inflated: ${n1.getLong(7)}")
    assert(n1.getLong(1) === 4L) // 4 rows for nation 1 across deltas
  }

  test("audit refuses a reportCol outside the QI") {
    import spark.implicits._
    val st = Privacy.classState(
      Seq((1, 0L, "A")).toDF("nat", "band", "seg"), Seq("nat", "band"), "seg")
    val e = intercept[IllegalArgumentException](
      Privacy.audit(st, Seq("nat", "band"), "seg"))
    assert(e.getMessage.contains("reportCol"))
  }

  test("a QI or sensitive column named 'c' is refused loudly") {
    // the count column's name is part of the state contract — audit()
    // canonicalizes on every column EXCEPT 'c', so a caller column of
    // that name would silently drop out of the grain and corrupt the
    // l-diversity floor (the r12 advisory); both entry points refuse
    import spark.implicits._
    val df = Seq((1, 0L, "A")).toDF("c", "band", "seg")
    val e1 = intercept[IllegalArgumentException](
      Privacy.classState(df, Seq("c", "band"), "seg"))
    assert(e1.getMessage.contains("reserved"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Privacy.classState(df.toDF("nat", "band", "c"), Seq("nat", "band"), "c"))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    val st = Privacy.classState(
      Seq((1, 0L, "A")).toDF("nat", "band", "seg"), Seq("nat", "band"), "seg")
      .withColumnRenamed("nat", "c")
    val e3 = intercept[IllegalArgumentException](
      Privacy.audit(st, Seq("c", "band"), "band"))
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
  }
}
