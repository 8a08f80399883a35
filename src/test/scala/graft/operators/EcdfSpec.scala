package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EcdfSpec extends SparkSpec {
  import spark.implicits._

  test("groupedCumsum equals the naive per-group window on every row") {
    val rows = (1 to 500).map { i =>
      (s"g${i % 7}", (i * 37) % 101L, (i % 13).toLong + 1, (i % 5).toLong)
    }
    // value-grain: one row per (g, v)
    val d = rows.toDF("g", "v", "c1", "c2")
      .groupBy("g", "v").agg(sum("c1").as("c1"), sum("c2").as("c2"))
    val got = Ecdf.groupedCumsum(d, Seq("g"), "v", Seq("c1", "c2"))
      .select("g", "v", "cum_c1", "cum_c2")
      .as[(String, Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val naive = d
      .select(col("g"), col("v"),
        sum(col("c1")).over(w).as("n1"), sum(col("c2")).over(w).as("n2"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === naive && got.nonEmpty)
  }

  test("tot_<c> carries the exact group total on every row") {
    val d = Seq(("a", 1L, 2L), ("a", 5L, 3L), ("b", 2L, 10L)).toDF("g", "v", "c")
    val got = Ecdf.groupedCumsum(d, Seq("g"), "v", Seq("c"))
      .select("g", "v", "cum_c", "tot_c")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 2L, 5L), ("a", 5L, 5L, 5L), ("b", 2L, 10L, 10L)))
  }

  test("a global cumsum (no group columns) is exact too") {
    val d = Seq((5L, 2L), (1L, 3L), (9L, 1L), (3L, 4L)).toDF("v", "c")
    val got = Ecdf.groupedCumsum(d, Seq.empty, "v", Seq("c"))
      .select("v", "cum_c").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 3L -> 7L, 5L -> 9L, 9L -> 10L))
  }

  test("withNext: next_<orderCol> equals the naive per-group lead on every row") {
    val rows = (1 to 500).map { i =>
      (s"g${i % 7}", (i * 37) % 101L, (i % 13).toLong + 1)
    }
    val d = rows.toDF("g", "v", "c")
      .groupBy("g", "v").agg(sum("c").as("c")) // value grain
    val got = Ecdf.groupedCumsum(d, Seq("g"), "v", Seq("c"), withNext = true)
      .select("g", "v", "next_v")
      .as[(String, Long, Option[Long])].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val naive = d.select(col("g"), col("v"), lead(col("v"), 1).over(w).as("nv"))
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got === naive && got.nonEmpty)
    // exactly one NULL successor per group (its maximum)
    assert(got.count(_._3.isEmpty) === 7)
  }

  test("non-default slice counts are exact end-to-end (cumsum, totals, next)") {
    // the slice width is a pure parallelism knob: any positive count
    // must reproduce the naive window bit-for-bit — including widths
    // far from the rig's 32 (1 = degenerate single slice, 5 = slices
    // straddle groups, 97 = more slices than distinct values)
    val rows = (1 to 400).map { i =>
      (s"g${i % 5}", (i * 41) % 83L, (i % 7).toLong + 1)
    }
    val d = rows.toDF("g", "v", "c")
      .groupBy("g", "v").agg(sum("c").as("c")) // value grain
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val naive = d.select(col("g"), col("v"),
        sum(col("c")).over(w).as("cum"),
        sum(col("c")).over(w.rowsBetween(Long.MinValue, Long.MaxValue)).as("tot"),
        lead(col("v"), 1).over(w).as("nv"))
      .as[(String, Long, Long, Long, Option[Long])].collect().toSet
    for (s <- Seq(1, 5, 97)) {
      val got = Ecdf.groupedCumsum(d, Seq("g"), "v", Seq("c"),
          slices = s, withNext = true)
        .select(col("g"), col("v"), col("cum_c"), col("tot_c"), col("next_v"))
        .as[(String, Long, Long, Long, Option[Long])].collect().toSet
      assert(got === naive && got.nonEmpty, s"slices=$s diverged from naive")
    }
  }

  test("the default slice count follows spark.sql.shuffle.partitions") {
    // slices=0 (the default) must derive the range-partition width from
    // the session's shuffle parallelism at plan time — the 100 TB knob:
    // a cluster running shuffle.partitions=4000 gets a 4000-way cumsum
    // stage with no code change (r10 verdict: the compiled-in 32 was
    // the one hard parallelism cap left in the engine)
    val d = (1 to 200).map(i => (s"g${i % 3}", (i * 13 % 89).toLong, 1L))
      .toDF("g", "v", "c").groupBy("g", "v").agg(sum("c").as("c"))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val plan = Ecdf.groupedCumsum(d, Seq("g"), "v", Seq("c"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("rangepartitioning") && plan.contains(", 7)"),
        s"range exchange did not pick up shuffle.partitions=7:\n$plan")
      // and the values are still exact at the non-rig width
      val got = Ecdf.groupedCumsum(d, Seq("g"), "v", Seq("c"))
        .select("g", "v", "cum_c").as[(String, Long, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v"))
      val naive = d.select(col("g"), col("v"), sum(col("c")).over(w).as("n"))
        .as[(String, Long, Long)].collect().toSet
      assert(got === naive && got.nonEmpty)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("a non-numeric shuffle.partitions setting fails with the remedy") {
    // vanilla Spark validates the conf as an int at set() time, but
    // some platforms accept e.g. "auto" (externally-managed AQE) — the
    // derived default must name the conf, the value, and the explicit
    // slices escape hatch rather than throw a bare NumberFormatException
    for (bad <- Seq("auto", "0", "-3", "")) {
      val e = intercept[IllegalArgumentException] {
        Ecdf.parseSliceWidth(bad)
      }
      assert(e.getMessage.contains(s"'$bad'")
        && e.getMessage.contains("slices > 0"), s"for '$bad': ${e.getMessage}")
    }
    assert(Ecdf.parseSliceWidth("7") === 7)
  }

  test("both consumers observe ONE range exchange (offs side is a ReusedExchange)") {
    // groupedCumsum's correctness hinges on the offs aggregate and the
    // final join observing IDENTICAL range-partition boundaries:
    // spark_partition_id over a sampled repartitionByRange is only
    // consistent across the self-join when the exchange is planned
    // once and REUSED. If a future plan shape re-plans the range
    // exchange per consumer (each samples independently), offsets
    // attach to mismatched slice ids and cumsums go silently wrong —
    // this must fail loudly instead. AQE stage reuse only shows in the
    // FINAL adaptive plan, so collect() first and read the plan's own
    // queryExecution (a count() would wrap a new, unexecuted plan).
    val d = (1 to 5000).map(i => (s"g${i % 3}", (i * 37 % 997).toLong, 1L))
      .toDF("g", "v", "c")
      .groupBy("g", "v").agg(sum("c").as("c"))
    val out = Ecdf.groupedCumsum(d, Seq("g"), "v", Seq("c"))
    out.collect()
    val s = out.queryExecution.executedPlan.toString
    assert(s.contains("isFinalPlan=true"), s)
    val fin = s.split("== Initial Plan ==")(0).linesIterator.toSeq
    val materialized = fin.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    val reused = fin.count(l =>
      l.contains("ReusedExchange") && l.contains("rangepartitioning"))
    assert(materialized === 1,
      s"expected exactly one materialized range exchange, got $materialized:\n$s")
    assert(reused === 1,
      s"offs consumer no longer reuses the range exchange (boundary mismatch risk):\n$s")
  }

  test("the plan's only unbounded-partition window is over the offset table") {
    // the operator's reason to exist: no per-group window ever sees
    // row-grain data — the slice windows partition by (group, pid) and
    // the lone group-only window runs over the ≤|groups|×slices offset
    // aggregate, never over the input relation
    val d = (1 to 100).map(i => (s"g${i % 3}", i.toLong, 1L)).toDF("g", "v", "c")
      .groupBy("g", "v").agg(sum("c").as("c"))
    val plan = Ecdf.groupedCumsum(d, Seq("g"), "v", Seq("c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global single-task window:\n$plan")
    // every Window node keyed only on the group must sit above an
    // Aggregate (the offset table), not above the raw scan — proxy:
    // exactly one exchange introduced by repartitionByRange
    assert("rangepartitioning".r.findAllIn(plan.toLowerCase).nonEmpty, plan)
  }
}
