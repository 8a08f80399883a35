package graft

/** Driver-contract invariants: t1 smoke shape, registry consistency. */
class SparkEntrySpec extends SparkSpec {

  test("entry (t1 smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are unique and stable") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(names.forall(_.matches("q[0-9]+_[a-z0-9_]+")), names.mkString(","))
  }

  test("every query runs and returns a non-empty, non-degenerate schema at sf0.001") {
    SparkEntry.registry.foreach { q =>
      val df = q.run(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      assert(df.columns.map(_.toLowerCase).distinct.length === df.columns.length,
        s"${q.name} has case-colliding column names (breaks the driver's column sort)")
    }
  }
}
