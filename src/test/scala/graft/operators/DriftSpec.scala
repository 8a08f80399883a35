package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def hist2(rows: Seq[(String, Long, Long, Long)]) =
    rows.toDF("g", "v", "c1", "c2")

  test("ksAndW1(withAd, withEnergy) matches the hand-computed statistics") {
    // A = {5, 7, 7}, B = {5, 9}: n1=3, n2=2, N=5
    // v=5: a=1,b=1,j=2, dev=|1·2−1·3|=1, c=2 → AD term 2·1/(2·3) = 1/3
    // v=7: a=3,b=1,j=4, dev=|3·2−1·3|=3, c=2 → AD term 2·9/(4·1) = 4.5
    // v=9: j=N, excluded (dev=0, H(1−H)=0)
    // A² = (1/3 + 9/2) / (3·2) = 0.805555…
    // energy: gaps 5→7 (dev=1, 1²·2=2) + 7→9 (dev=3, 3²·2=18) → esum=20,
    // E = 2·20/(3·2)² = 40/36 = 1.111111…
    val h = hist2(Seq(("s", 5L, 1L, 1L), ("s", 7L, 2L, 0L), ("s", 9L, 0L, 1L)))
    val r = Drift.ksAndW1(h, Seq("g"), "v", "c1", "c2", withAd = true,
        withEnergy = true)
      .select("g", "n1", "n2", "ks_d", "w1", "cvm", "ad", "energy")
      .as[(String, Long, Long, Double, Double, Double, Double, Double)].head()
    assert(r._2 === 3L && r._3 === 2L)
    assert(math.abs(r._4 - 0.5) < 1e-9)          // KS unchanged
    assert(math.abs(r._5 - 8.0 / 6) < 1e-6)      // W1 unchanged
    assert(math.abs(r._6 - 20.0 / 150) < 1e-6)   // CvM unchanged
    // quantized: floor(2e6/6) + floor(18e6/4) = 333333 + 4500000,
    // divided back out and rounded the way ksAndW1 rounds (6dp HALF_UP)
    val want = BigDecimal(4833333.0 / 6e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r._7 - want) < 1e-9, s"ad=${r._7} want=$want")
    assert(math.abs(r._8 - BigDecimal(40.0 / 36)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"energy=${r._8}")
  }

  test("asum and esum equal BigInt references on random histograms") {
    val rng = new scala.util.Random(42)
    val rows = for (g <- Seq("a", "b"); v <- 0 until 40 if rng.nextInt(3) > 0)
      yield (g, v.toLong, rng.nextInt(50).toLong, rng.nextInt(50).toLong)
    val got = Drift.reductions(hist2(rows), Seq("g"), "v", "c1", "c2",
        withAd = true, withEnergy = true)
      .select(col("g"), col("asum").cast("string"), col("esum").cast("string"))
      .as[(String, String, String)].collect()
      .map(r => r._1 -> ((BigInt(r._2), BigInt(r._3)))).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val byV = rs.sortBy(_._2)
      val n1 = BigInt(byV.map(_._3).sum); val n2 = BigInt(byV.map(_._4).sum)
      val n = n1 + n2
      var (a, b, acc, eacc) = (BigInt(0), BigInt(0), BigInt(0), BigInt(0))
      for (((v, _, c1, c2), i) <- byV.map(r => (r._2, r._1, r._3, r._4)).zipWithIndex) {
        a += c1; b += c2
        val j = a + b
        if (j < n) { // the maximal value is excluded
          val dev = (a * n2 - b * n1).abs
          acc += (c1 + c2) * dev * dev * 1000000 / (j * (n - j))
          eacc += dev * dev * (byV(i + 1)._2 - v)
        }
      }
      g -> ((acc, eacc))
    }
    assert(got === want && got.values.exists(_._2 > 0))
  }

  test("an untied two-sample reproduces the classical Pettitt formula") {
    // all counts 1 → each distinct value is one pooled observation, so
    // the value-grain statistic must equal the textbook per-observation
    // sum A² = 1/(n1·n2) Σ_{j<N} (M_j·N − j·n1)²/(j(N−j))
    val xs = Seq(1L, 4L, 6L, 10L, 11L) // side A
    val ys = Seq(2L, 3L, 7L, 12L)      // side B
    val rows = xs.map(v => ("g", v, 1L, 0L)) ++ ys.map(v => ("g", v, 0L, 1L))
    val got = Drift.ksAndW1(hist2(rows), Seq("g"), "v", "c1", "c2",
        withAd = true)
      .select("ad").as[Double].head()
    val pooled = (xs.map((_, true)) ++ ys.map((_, false))).sortBy(_._1)
    val (n1, n2) = (xs.size, ys.size); val n = n1 + n2
    var m = 0
    val ref = (for (((_, isA), j0) <- pooled.zipWithIndex.dropRight(1)) yield {
      if (isA) m += 1
      val j = j0 + 1
      math.pow(m.toDouble * n - j.toDouble * n1, 2) / (j.toDouble * (n - j))
    }).sum / (n1.toDouble * n2)
    assert(math.abs(got - BigDecimal(ref).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6, s"got=$got ref=$ref")
  }

  test("zero-count padding rows are inert for AD too (the q209 shape)") {
    // Same sample as the Pettitt test, padded with a leading grid row
    // (pooled cumulative j = 0), an interior empty cell, and a trailing
    // row past the old maximum — the trailing row turns v=9 into a
    // NON-maximal j = N row, the exact 0/0 shape the AD term's den > 0
    // gate exists for: without it a bare floor division raises
    // DIVIDE_BY_ZERO under ANSI (or trips the overflow sentry with a
    // misleading message under non-ANSI) on precisely the padded
    // histograms q209's static month×grid fan-out builds.
    val bare = hist2(Seq(
      ("s", 5L, 1L, 1L), ("s", 7L, 2L, 0L), ("s", 9L, 0L, 1L)))
    val padded = hist2(Seq(
      ("s", 4L, 0L, 0L), ("s", 5L, 1L, 1L), ("s", 6L, 0L, 0L),
      ("s", 7L, 2L, 0L), ("s", 9L, 0L, 1L), ("s", 10L, 0L, 0L)))
    def run(h: org.apache.spark.sql.DataFrame) =
      Drift.ksAndW1(h, Seq("g"), "v", "c1", "c2", withAd = true,
          withEnergy = true)
        .select("n1", "n2", "ks_d", "w1", "cvm", "ad", "energy").head()
    assert(run(padded) === run(bare))
  }

  private def overflowHist = hist2(Seq(
    ("big", 0L, 7000000000000L, 1L),
    ("big", 1L, 3000000000000L, 9999999999999L)))

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ messages(x.getCause))

  test("decimal(38,0) overflow raises natively under ANSI (the default)") {
    // counts ~1e13 per side: dev ~ 7e25, cvm term ~ c·dev² ~ 3e64 — far
    // past 38 digits. Spark 4 runs ANSI by default, where the decimal
    // product itself raises NUMERIC_VALUE_OUT_OF_RANGE — already loud.
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    val e = intercept[Exception] {
      Drift.ksAndW1(overflowHist, Seq("g"), "v", "c1", "c2").collect()
    }
    assert(messages(e).mkString.contains("NUMERIC_VALUE_OUT_OF_RANGE"),
      s"expected the ANSI overflow error:\n${messages(e).mkString("\n")}")
  }

  test("under non-ANSI the guard raises instead of dropping NULL terms") {
    // with spark.sql.ansi.enabled=false (common on migration clusters)
    // the overflowed product is NULL and a bare sum/max would SKIP it —
    // a silent wrong answer, and one that diverges from the oracle
    // twin's HUGEINT out-of-range error. The reductions-level sentry
    // must fail the query with the group and sizes in the message.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e = intercept[Exception] {
        Drift.ksAndW1(overflowHist, Seq("g"), "v", "c1", "c2").collect()
      }
      val all = messages(e).mkString("\n")
      assert(all.contains("graft.Drift") && all.contains("overflow"),
        s"expected the Drift overflow guard, got:\n$all")
      assert(all.contains("big"), s"guard message must name the group:\n$all")
      assert(all.contains("n1=10000000000000"),
        s"guard message must carry the side sizes:\n$all")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("healthy groups pass the guard untouched (no false positives)") {
    val h = hist2(Seq(("g", 1L, 1000000L, 2000000L), ("g", 2L, 3000000L, 500000L)))
    val r = Drift.ksAndW1(h, Seq("g"), "v", "c1", "c2", withAd = true,
      withEnergy = true).collect()
    assert(r.length === 1 && !r.head.anyNull)
  }

  test("an empty side yields NULL statistics, not NaN (dialect guard)") {
    val h = hist2(Seq(("g", 1L, 5L, 0L), ("g", 2L, 3L, 0L)))
    val r = Drift.ksAndW1(h, Seq("g"), "v", "c1", "c2", withAd = true,
      withEnergy = true).head()
    for (c <- Seq("ks_d", "w1", "cvm", "ad", "energy"))
      assert(r.isNullAt(r.fieldIndex(c)), s"$c should be NULL on an empty side")
  }

  // 3e7 rows per side at complete separation: AD's ×10⁶ numerator
  // (2.43e43) is past 38 digits while KS (9e14), W1 (9e14), CvM
  // (2.43e37) all still fit — the fixture that separates the
  // per-statistic sentries
  private def adOnlyOverflowHist = hist2(Seq(
    ("adb", 0L, 30000000L, 0L), ("adb", 1L, 0L, 30000000L)))

  test("overflow sentry is PER STATISTIC: AD overflow leaves KS/W1/CvM served") {
    // one shared counter would abort every statistic when only AD (the
    // ~50×-tightest bound) is past headroom, forcing a re-run with
    // withAd=false; per-statistic counters + column pruning let the
    // caller simply not select the overflowed column
    for (ansi <- Seq("true", "false")) {
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        val safe = Drift.ksAndW1(adOnlyOverflowHist, Seq("g"), "v",
            "c1", "c2", withAd = true, withEnergy = true)
          .select("g", "ks_d", "w1", "cvm", "energy").head()
        assert(safe.getString(0) === "adb" && !safe.anyNull,
          s"safe statistics not served under ansi=$ansi: $safe")
        assert(math.abs(safe.getDouble(1) - 1.0) < 1e-9) // complete sep
        val e = intercept[Exception] {
          Drift.ksAndW1(adOnlyOverflowHist, Seq("g"), "v", "c1", "c2",
            withAd = true).select("g", "ad").collect()
        }
        val all = messages(e).mkString("\n")
        assert(all.contains("NUMERIC_VALUE_OUT_OF_RANGE")
          || (all.contains("ad") && all.contains("overflow")),
          s"ad column must still raise under ansi=$ansi:\n$all")
      } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    }
  }

  // 1e6 rows per side across a 1e14-wide value span: the energy
  // numerator (nn²·range = 1e38) is the only statistic past headroom —
  // and its bound is RANGE-driven, exactly what autoCoarsen buys back
  private def energyOverflowHist = hist2(Seq(
    ("en", 0L, 1000000L, 0L), ("en", 100000000000000L, 0L, 1000000L)))

  test("autoCoarsen serves the coarse-grid-exact answer instead of raising") {
    for (ansi <- Seq("true", "false")) {
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        // without coarsening: energy raises (both configurations)
        intercept[Exception] {
          Drift.ksAndW1(energyOverflowHist, Seq("g"), "v", "c1", "c2",
            withEnergy = true).select("g", "energy").collect()
        }
        // with autoCoarsen: served, with the factor the bound demands
        val r = Drift.ksAndW1(energyOverflowHist, Seq("g"), "v", "c1", "c2",
            withAd = true, withEnergy = true, autoCoarsen = true)
          .select("g", "ks_d", "w1", "cvm", "ad", "energy", "grid_factor")
          .head()
        assert(!r.anyNull && r.getLong(6) === 10L, s"got $r")
        // lockstep: identical to running the PLAIN operator on a
        // manually pre-coarsened histogram (v → v div 10), with the
        // value-unit statistics scaled back into original units
        val manual = Drift.ksAndW1(
            hist2(Seq(("en", 0L, 1000000L, 0L),
              ("en", 10000000000000L, 0L, 1000000L))),
            Seq("g"), "v", "c1", "c2", withAd = true, withEnergy = true)
          .select("g", "ks_d", "w1", "cvm", "ad", "energy").head()
        assert(r.getDouble(1) === manual.getDouble(1), "ks")
        assert(r.getDouble(3) === manual.getDouble(3), "cvm")
        assert(r.getDouble(4) === manual.getDouble(4), "ad")
        assert(r.getDouble(2) === manual.getDouble(2) * 10, "w1 units")
        assert(r.getDouble(5) === manual.getDouble(5) * 10, "energy units")
        // complete separation: E = 2∫1²dx = 2·range exactly, and the
        // coarse grid preserves it (dev is constant across the span)
        assert(r.getDouble(5) === 2.0e14, s"energy=${r.getDouble(5)}")
      } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    }
  }

  test("autoCoarsen keeps KS on the FINE grid while W1/energy coarsen") {
    // coarsening merges v=0 and v=5 into one bin (f=10): a coarse-grid
    // KS would see the 1e6-vs-1e6 merged cell as dev≈0 and miss the
    // complete separation the fine grid shows — the gap statistics
    // must never quietly move to the coarse grid (they gain no
    // headroom there; only W1/energy do)
    val h = hist2(Seq(
      ("g", 0L, 1000000L, 0L), ("g", 5L, 0L, 1000000L),
      ("g", 100000000000000L, 1L, 1L)))
    val r = Drift.ksAndW1(h, Seq("g"), "v", "c1", "c2",
        withAd = true, withEnergy = true, autoCoarsen = true)
      .select("ks_d", "w1", "cvm", "ad", "energy", "grid_factor").head()
    // n1 = n2 = 1e6+1 → worst-case nn²·range just over 1e38 → next
    // power of ten is 100
    assert(r.getLong(5) === 100L, s"expected an active factor: $r")
    assert(r.getDouble(0) > 0.9,
      s"KS degraded to the coarse grid under autoCoarsen: ks_d=${r.getDouble(0)}")
    // and the fine-grid statistics equal the PLAIN operator's (which
    // serves them fine-grid by definition; w1/energy differ by design)
    val plain = Drift.ksAndW1(h, Seq("g"), "v", "c1", "c2",
        withAd = true, withEnergy = true)
      .select("ks_d", "cvm", "ad").head()
    assert(r.getDouble(0) === plain.getDouble(0), "ks")
    assert(r.getDouble(2) === plain.getDouble(1), "cvm")
    assert(r.getDouble(3) === plain.getDouble(2), "ad")
  }

  test("autoCoarsen leaves healthy groups bit-identical (factor 1)") {
    val h = hist2(Seq(("s", 5L, 1L, 1L), ("s", 7L, 2L, 0L), ("s", 9L, 0L, 1L)))
    val plain = Drift.ksAndW1(h, Seq("g"), "v", "c1", "c2",
      withAd = true, withEnergy = true).head()
    val auto = Drift.ksAndW1(h, Seq("g"), "v", "c1", "c2",
        withAd = true, withEnergy = true, autoCoarsen = true)
      .select("g", "n1", "n2", "ks_d", "w1", "cvm", "ad", "energy",
        "grid_factor").head()
    assert(auto.getLong(8) === 1L, "healthy group must not coarsen")
    for (i <- 0 until 8)
      assert(auto.get(i) === plain.get(i), s"column $i diverged: $auto vs $plain")
  }

  test("autoCoarsen with empty partCols (ungrouped read) serves like the plain path") {
    // regression: coarsened() joined hist to the factor relation with
    // join(st, Seq.empty) — an implicit no-condition inner join that
    // fails under spark.sql.crossJoin.enabled=false; the crossJoin
    // special-case reductions() itself uses must apply here too
    val rows = Seq(("g", 1L, 3L, 1L), ("g", 5L, 1L, 2L), ("g", 9L, 2L, 3L))
    val auto = Drift.ksAndW1(hist2(rows).drop("g"), Seq.empty, "v", "c1", "c2",
        withAd = true, withEnergy = true, autoCoarsen = true)
      .select("ks_d", "w1", "cvm", "ad", "energy", "grid_factor").head()
    val plain = Drift.ksAndW1(hist2(rows).drop("g"), Seq.empty, "v", "c1", "c2",
        withAd = true, withEnergy = true)
      .select("ks_d", "w1", "cvm", "ad", "energy").head()
    assert(auto.getLong(5) === 1L, "healthy ungrouped read must get factor 1")
    (0 to 4).foreach(i => assert(auto.getDouble(i) === plain.getDouble(i), s"col $i"))
  }

  test("covarianceDrift raises loudly on ragged vector dimensions") {
    // r15 advice close-out: a half whose vectors disagree on dimension
    // would silently mis-scale frob_dist off the (1,1) carrier cell —
    // the state-grain uniformity check must raise instead
    import spark.implicits._
    val ragged = Seq((1, 0L, Seq(1L, 2L)), (1, 0L, Seq(3L)),
      (1, 1L, Seq(1L, 2L)), (1, 1L, Seq(3L, 4L)))
      .toDF("label", "h", "q")
    val e = intercept[Exception] {
      Drift.covarianceDrift(Drift.covarianceCellState(ragged)).collect()
    }
    assert(e.getMessage.contains("ragged"), e.getMessage)
    // uniform dims across both halves pass untouched
    val ok = Seq((1, 0L, Seq(1L, 2L)), (1, 1L, Seq(3L, 4L)))
      .toDF("label", "h", "q")
    assert(Drift.covarianceDrift(Drift.covarianceCellState(ok)).count() === 1L)
  }

  test("autoCoarsen refuses a fractional value grid loudly") {
    // the long re-bin would TRUNCATE fractional values (even at f = 1,
    // v=0.25 and v=0.75 both land in bin 0 — a silently corrupted
    // distribution); the guard must raise with the pre-scale remedy
    import spark.implicits._
    val frac = Seq(("g", 0.25d, 3L, 1L), ("g", 0.75d, 1L, 2L))
      .toDF("g", "v", "c1", "c2")
    val e = intercept[Exception] {
      Drift.ksAndW1(frac, Seq("g"), "v", "c1", "c2",
        withAd = false, withEnergy = false, autoCoarsen = true)
        .collect()
    }
    assert(e.getMessage.contains("integer value grid"), e.getMessage)
    // the PLAIN path accepts the same fractional grid fine
    val plain = Drift.ksAndW1(frac, Seq("g"), "v", "c1", "c2",
      withAd = false, withEnergy = false)
      .select("ks_d").head()
    assert(plain.getDouble(0) > 0)
  }

  test("autoCoarsen refuses a fractional-SCALE decimal grid statically") {
    // the runtime __frac probe casts through double, and a decimal with
    // |v| ≥ 2^53 rounds integral under that cast — a fractional decimal
    // grid would sail through into the silent long truncation (the r12
    // advisory). The static schema check catches it regardless of the
    // data's magnitude; a scale-0 decimal stays accepted.
    import spark.implicits._
    val dec = Seq(("g", BigDecimal("9007199254740993.25"), 3L, 1L),
        ("g", BigDecimal("9007199254740995.75"), 1L, 2L))
      .toDF("g", "v", "c1", "c2")
      .select(col("g"), col("v").cast("decimal(38,2)").as("v"),
        col("c1"), col("c2"))
    val e = intercept[IllegalArgumentException] {
      Drift.ksAndW1(dec, Seq("g"), "v", "c1", "c2",
        withAd = false, withEnergy = false, autoCoarsen = true)
    }
    assert(e.getMessage.contains("integer value grid")
      && e.getMessage.contains("decimal(38,2)"), e.getMessage)
    val ok = Seq(("g", 5L, 1L, 1L), ("g", 9L, 2L, 1L))
      .toDF("g", "v", "c1", "c2")
      .select(col("g"), col("v").cast("decimal(38,0)").as("v"),
        col("c1"), col("c2"))
    val r = Drift.ksAndW1(ok, Seq("g"), "v", "c1", "c2",
        withAd = false, withEnergy = false, autoCoarsen = true)
      .select("ks_d").head()
    assert(r.getDouble(0) >= 0)
    // NARROW fractional-scale decimals (precision ≤ 15) stay accepted:
    // the double probe is provably exact there — integral values pass,
    // fractional values are still caught at RUNTIME (r13: the static
    // refusal is precision-scoped, not a scale>0 blanket)
    val okNarrow = Seq(("g", BigDecimal("5.00"), 1L, 1L),
        ("g", BigDecimal("9.00"), 2L, 1L))
      .toDF("g", "v", "c1", "c2")
      .select(col("g"), col("v").cast("decimal(12,2)").as("v"),
        col("c1"), col("c2"))
    val rn = Drift.ksAndW1(okNarrow, Seq("g"), "v", "c1", "c2",
        withAd = false, withEnergy = false, autoCoarsen = true)
      .select("ks_d").head()
    assert(rn.getDouble(0) >= 0)
    val fracNarrow = Seq(("g", BigDecimal("5.25"), 1L, 1L),
        ("g", BigDecimal("9.75"), 2L, 1L))
      .toDF("g", "v", "c1", "c2")
      .select(col("g"), col("v").cast("decimal(12,2)").as("v"),
        col("c1"), col("c2"))
    val e2 = intercept[Exception] {
      Drift.ksAndW1(fracNarrow, Seq("g"), "v", "c1", "c2",
        withAd = false, withEnergy = false, autoCoarsen = true).collect()
    }
    assert(e2.getMessage.contains("integer value grid"), e2.getMessage)
  }

  test("autoCoarsen lockstep holds on random overflow-regime histograms") {
    // randomized version of the fixed lockstep fixture: counts
    // 1e4..1e5 per row over a ~1e18 value span put ONLY energy past
    // the decimal(38,0) bound (nn²·range ≳ 1e40; w1 ~1e29, ad ≤ ~5e33
    // even at complete separation), so every trial exercises an
    // active factor. Laws: (a) the count-driven statistics equal the
    // PLAIN fine-grid read; (b) the value-unit statistics equal the
    // plain operator on a manually ⌊v/f⌋-coarsened histogram, scaled
    // back by f
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val nVals = 3 + rng.nextInt(6)
      val vals = Seq.fill(nVals)(math.abs(rng.nextLong()) % 900000000000000000L)
        .distinct.sorted
      val rows = vals.map(v => ("g", v,
        (10000 + rng.nextInt(90000)).toLong,
        (10000 + rng.nextInt(90000)).toLong))
      val auto = Drift.ksAndW1(hist2(rows), Seq("g"), "v", "c1", "c2",
          withAd = true, withEnergy = true, autoCoarsen = true)
        .select("ks_d", "w1", "cvm", "ad", "energy", "grid_factor").head()
      val f = auto.getLong(5)
      assert(f > 1L, s"trial $trial: expected an active factor, got $f")
      val fine = Drift.ksAndW1(hist2(rows), Seq("g"), "v", "c1", "c2",
          withAd = true, withEnergy = true)
        .select("ks_d", "cvm", "ad").head()
      assert(auto.getDouble(0) === fine.getDouble(0), s"trial $trial ks")
      assert(auto.getDouble(2) === fine.getDouble(1), s"trial $trial cvm")
      assert(auto.getDouble(3) === fine.getDouble(2), s"trial $trial ad")
      val manualRows = rows.groupBy(r => Math.floorDiv(r._2, f))
        .map { case (v, rs) =>
          ("g", v, rs.map(_._3).sum, rs.map(_._4).sum) }.toSeq
      val manual = Drift.ksAndW1(hist2(manualRows), Seq("g"), "v",
          "c1", "c2", withEnergy = true)
        .select("w1", "energy").head()
      // the operator multiplies f INSIDE the rounded division while
      // this replay multiplies the rounded quotient — at ~1e16
      // magnitudes (where 6-dp rounding is sub-ulp) the two orders
      // differ by the last ulp, so the product law is relative, not
      // bit-exact (the fixed-fixture lockstep test pins bit-equality
      // where magnitudes allow it)
      def relEq(a: Double, b: Double): Boolean =
        math.abs(a - b) <= 1e-12 * math.max(math.abs(a), math.abs(b))
      assert(relEq(auto.getDouble(1), manual.getDouble(0) * f),
        s"trial $trial w1: ${auto.getDouble(1)} vs ${manual.getDouble(0) * f}")
      assert(relEq(auto.getDouble(4), manual.getDouble(1) * f),
        s"trial $trial energy: ${auto.getDouble(4)} vs ${manual.getDouble(1) * f}")
    }
  }

  test("autoCoarsen cannot mask a count-driven overflow (CvM still raises)") {
    // overflowHist busts CvM via counts alone (dev² ~ 4.9e51 on a
    // 1-wide grid); no grid factor helps, so the sentry must still
    // fire — autoCoarsen is a range-bound mitigation, not a silencer
    for (ansi <- Seq("true", "false")) {
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        val e = intercept[Exception] {
          Drift.ksAndW1(overflowHist, Seq("g"), "v", "c1", "c2",
            autoCoarsen = true).select("g", "cvm").collect()
        }
        val all = messages(e).mkString("\n")
        assert(all.contains("NUMERIC_VALUE_OUT_OF_RANGE")
          || (all.contains("cvm") && all.contains("overflow")),
          s"count-driven overflow slipped past autoCoarsen under ansi=$ansi:\n$all")
      } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    }
  }
}
