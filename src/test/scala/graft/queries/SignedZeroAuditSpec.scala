package graft.queries

import graft.SparkSpec
import graft.tools.DiagSignedZero
import org.apache.spark.sql.functions.{lit, round => sqlRound}

/** Registry-wide signed-zero audit (round-10, closing the q194 class).
  *
  * Mechanism: DuckDB's `round(x, d)` preserves the sign of a tiny
  * negative (-0.0) while Spark's `Round` (BigDecimal HALF_UP -> toDouble)
  * returns +0.0, so any rounded double output whose pre-round value can
  * land within one ulp below zero hash-diverges at the driver's
  * exact-compare gate (round 9: q194 heaps_beta/r2 on a degenerate
  * template corpus). The fix contract is symmetric: `Q.noNegZero` (+0.0
  * IEEE add) on the Spark side AND the literal `+ 0.0` idiom in the
  * oracle SQL.
  *
  * This spec walks EVERY registered query's analyzed plan
  * ([[DiagSignedZero.audit]]), finds every DoubleType output whose
  * defining expression contains a Round, and requires each to be either
  *   (a) finished with the `+ 0.0` normalizer, or
  *   (b) on the [[SignedZeroSafe]] allowlist below - outputs that cannot
  *       produce -0.0 by construction.
  * Both directions are asserted: an unclassified bare column fails (the
  * q194 regression), and a stale allowlist entry that is now finished
  * fails too (keeps the list honest as queries evolve).
  */
class SignedZeroAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Rounded double outputs that cannot be -0.0 by construction.
    *
    * Justification categories (each entry falls in one):
    *  - SUM/AVG/MIN/MAX/percentile over a strictly positive domain
    *    (prices, quantities, token counts, event values >= 0.01, file
    *    sizes, degrees, depths): q01, q03, q06, q09, q11, q12, q14, q15,
    *    q17, q19, q20, q22, q40, q47, q49, q50, q56, q57, q61, q64, q65,
    *    q66, q67, q82, q90, q97, q99, q106, q107, q125, q147, q154,
    *    q163, q192 (mean/target chars), q197 (totalprice cents), q200.
    *  - Ratio / share / rate / probability in [0, 1]: q66 share, q67
    *    promo_share, q68, q74, q80, q83, q103, q120, q143, q153, q155
    *    pos_rate, q159, q166, q167, q180, q188, q189, q193, q202 rates.
    *  - Nonnegative statistic by definition: chi-square (q168, q182,
    *    q201), KS D = max|diff| (q185, q199), entropy as sum of
    *    -p*ln(p) >= 0 terms (q53, q186 hx/hy), PSI with same-sign
    *    factor products (q149), MAPE/|error| (q152), lift (q111),
    *    BH threshold q*i/m (q199), Brier terms as means of squares
    *    (q202), epochs/need ratios (q195), Kneser-Ney probability
    *    (q167), RRF 1/(k+rank) sums (q169).
    *  - Nonnegative-weight linear algebra: tf-idf with ln((N+1)/(df+1))+1
    *    or df-capped ln(N/df) > 0 weights (q37, q85), count-vector
    *    cosine (q150), Jaccard/MinHash band-match fractions in [0,1]
    *    (q28, q29, q128), BM25 with log1p idf >= 0 (q137), L2 norms /
    *    squared distances (q32, q39, q93, q122, q179), HLL estimates
    *    (q148, q176 est_a/b/union - est_overlap IS finished since
    *    inclusion-exclusion can go negative), PageRank/HITS masses
    *    (q76, q112, q126), Adamic-Adar 1/ln(deg>=2) (q161), Kaplan-Meier
    *    survival product of [0,1] factors (q188).
    *  - Grid-exact multiples of 10^-d whose only near-zero value is
    *    exactly 0 (+0.0 in both engines): q164 score (score_units/1e7 at
    *    d=7), q36/q115/q116 header averages, q44, q24/q43/q118 token
    *    averages, q25, q54, q114, q79.
    */
  private val SignedZeroSafe: Set[(String, String)] = Set(
    ("q01_pricing_summary", "sum_qty"),
    ("q01_pricing_summary", "sum_base_price"),
    ("q01_pricing_summary", "sum_disc_price"),
    ("q01_pricing_summary", "sum_charge"),
    ("q01_pricing_summary", "avg_qty"),
    ("q01_pricing_summary", "avg_price"),
    ("q01_pricing_summary", "avg_disc"),
    ("q03_shipping_priority", "revenue"),
    ("q06_forecast_revenue", "revenue"),
    ("q09_running_revenue", "running_rev"),
    ("q11_rollup", "sum_qty"),
    ("q12_cube", "total"),
    ("q14_percentiles", "p25"),
    ("q14_percentiles", "p50"),
    ("q14_percentiles", "p75"),
    ("q15_range_join_bands", "total_price"),
    ("q17_union_snapshot", "total_price"),
    ("q40_local_supplier_volume", "revenue"),
    ("q47_unpivot", "total"),
    ("q49_hash_sample", "total"),
    ("q56_analytic_suite", "prev_price"),
    ("q56_analytic_suite", "next_price"),
    ("q56_analytic_suite", "pr"),
    ("q56_analytic_suite", "cd"),
    ("q57_skew_join", "total"),
    ("q61_split_labels", "total"),
    ("q64_histogram", "lo"),
    ("q64_histogram", "hi"),
    ("q66_revenue_share", "total"),
    ("q66_revenue_share", "share"),
    ("q67_promo_revenue", "promo_revenue"),
    ("q67_promo_revenue", "total_revenue"),
    ("q67_promo_revenue", "promo_share"),
    ("q82_bloom_semi_join", "revenue"),
    ("q90_equidepth_bins", "lo"),
    ("q90_equidepth_bins", "hi"),
    ("q90_equidepth_bins", "mass"),
    ("q97_topk_per_group", "price"),
    ("q111_basket_pairs", "lift"),
    ("q125_incremental_agg", "total_spend"),
    ("q152_forecast_backtest", "mape"),
    ("q159_join_forecast", "pct_of_total"),
    ("q168_benford_digits", "chi2"),
    ("q182_chisq_independence", "chi2"),
    ("q185_ks_drift", "ks_d"),
    ("q186_mutual_information", "hx_nats"),
    ("q186_mutual_information", "hy_nats"),
    ("q197_robust_means", "lo_cut"),
    ("q197_robust_means", "hi_cut"),
    ("q197_robust_means", "mean"),
    ("q197_robust_means", "trimmed_mean"),
    ("q197_robust_means", "winsorized_mean"),
    ("q199_drift_alarms_bh", "ks_d"),
    ("q199_drift_alarms_bh", "bh_threshold"),
    ("q200_hill_tail_index", "x_k"),
    ("q200_hill_tail_index", "hill_alpha"),
    ("q19_hourly_agg", "total_value"),
    ("q20_sliding_agg", "total_value"),
    ("q22_asof_view_purchase", "purchase_value"),
    ("q22_asof_view_purchase", "prior_view_value"),
    ("q50_map_funcs", "avg_k"),
    ("q65_asof_next_view", "next_view_value"),
    ("q99_rolling_hour", "mass_hour"),
    ("q106_mad_outliers", "med"),
    ("q106_mad_outliers", "mad"),
    ("q107_decayed_activity", "decayed_mass"),
    ("q147_ab_welch", "mean_a_cents"),
    ("q147_ab_welch", "mean_b_cents"),
    ("q154_bootstrap_ci", "mean_cents"),
    ("q154_bootstrap_ci", "ci_lo"),
    ("q154_bootstrap_ci", "ci_hi"),
    ("q163_time_weighted_avg", "tw_avg_value"),
    ("q188_kaplan_meier", "survival"),
    ("q24_token_stats", "avg_tokens"),
    ("q25_quality_filter", "avg_stop_ratio"),
    ("q28_jaccard_pairs", "jaccard"),
    ("q29_minhash_pairs", "est_jaccard"),
    ("q37_tfidf_top_terms", "score"),
    ("q43_bpe_tokens", "avg_bpe_tokens"),
    ("q44_winnow_fingerprint", "avg_fps"),
    ("q53_char_entropy", "avg_entropy"),
    ("q54_repetition_signals", "avg_dup_ratio"),
    ("q54_repetition_signals", "avg_top_frac"),
    ("q68_contamination", "contamination_rate"),
    ("q74_boilerplate_ngrams", "avg_boiler_frac"),
    ("q83_dup_span_coverage", "avg_dup_frac"),
    ("q85_tfidf_cosine_pairs", "cos"),
    ("q114_gopher_rules", "avg_mwl"),
    ("q118_pipeline_e2e", "avg_tokens"),
    ("q120_vocab_coverage", "coverage"),
    ("q128_prefix_filter_pairs", "jaccard"),
    ("q137_bm25_topk", "score"),
    ("q143_dedup_recall", "prec"),
    ("q143_dedup_recall", "rec"),
    ("q148_portable_hll", "est_distinct"),
    ("q148_portable_hll", "rel_err"),
    ("q149_corpus_drift", "value"),
    ("q150_source_affinity", "cosine"),
    ("q153_quality_auc", "auc"),
    ("q155_score_calibration", "pos_rate"),
    ("q164_pareto_frontier", "score"),
    ("q166_containment_pairs", "c_a"),
    ("q166_containment_pairs", "c_b"),
    ("q167_kneser_ney", "p_kn"),
    ("q169_rrf_fusion", "rrf"),
    ("q176_hll_overlap", "est_a"),
    ("q176_hll_overlap", "est_b"),
    ("q176_hll_overlap", "est_union"),
    ("q180_dataset_card", "p50_tokens"),
    ("q180_dataset_card", "dup_rate"),
    ("q180_dataset_card", "quality_rate"),
    ("q192_quantile_normalize", "mean_chars"),
    ("q192_quantile_normalize", "target_chars"),
    ("q193_perplexity_filter", "high_ppl_share"),
    ("q195_token_waterfill", "epochs"),
    ("q201_shard_balance", "chi2"),
    ("q203_wasserstein_drift", "w1_dollars"), // integral of |F_A−F_B| ≥ 0
    ("q204_conformal_threshold", "coverage"), // rate in [0,1]; threshold IS finished
    ("q205_drift_monitor", "ks_d"),    // max|F_A−F_B| ∈ [0,1]
    ("q205_drift_monitor", "w1_cents"), // integral of |F_A−F_B| ≥ 0
    ("q205_drift_monitor", "cvm"),     // pooled sum of squares ≥ 0
    ("q206_sliced_wasserstein", "ks_d"), // max|F_A−F_B| ∈ [0,1]
    ("q206_sliced_wasserstein", "w1"),   // integral of |F_A−F_B| ≥ 0
    ("q206_sliced_wasserstein", "cvm"),  // pooled sum of squares ≥ 0
    ("q207_ad_monitor", "ks_d"),    // max|F_A−F_B| ∈ [0,1]
    ("q207_ad_monitor", "w1_cents"), // integral of |F_A−F_B| ≥ 0
    ("q207_ad_monitor", "cvm"),     // pooled sum of squares ≥ 0
    ("q207_ad_monitor", "ad"),      // variance-weighted sum of squares ≥ 0
    ("q208_mmd_drift", "mmd2"),     // squared mean-embedding distance ≥ 0
    ("q209_drift_trajectory", "ks_d"),       // max|F_A−F_B| ∈ [0,1]
    ("q209_drift_trajectory", "w1_dollars"), // integral of |F_A−F_B| ≥ 0
    ("q210_drift_panel", "ks_d"),         // max|F_A−F_B| ∈ [0,1]
    ("q210_drift_panel", "w1_cents"),     // integral of |F_A−F_B| ≥ 0
    ("q210_drift_panel", "cvm"),          // pooled sum of squares ≥ 0
    ("q210_drift_panel", "ad"),           // variance-weighted sum of squares ≥ 0
    ("q210_drift_panel", "energy_cents"), // 2∫(F_A−F_B)²dx ≥ 0
    ("q211_trajectory_alarms", "ks_d"),         // max|F_A−F_B| ∈ [0,1]
    ("q211_trajectory_alarms", "bh_threshold"), // i·α/m > 0; p_value IS finished
    ("q212_retrieval_ndcg", "mrr_at_10"),  // mean of 1/rank ∈ [0,1]
    ("q212_retrieval_ndcg", "ndcg_at_10"), // mean of 1/log2(1+rank) ∈ [0,1]
    ("q212_retrieval_ndcg", "hit_at_1"),   // rate ∈ [0,1]
    ("q212_retrieval_ndcg", "hit_at_10"),  // rate ∈ [0,1]
    ("q213_chain_ndcg", "mrr"),            // mean of 1/rank ∈ [0,1]
    ("q213_chain_ndcg", "ndcg"),           // mean of 1/log2(1+rank) ∈ [0,1]
    ("q213_chain_ndcg", "hit_at_1"),       // rate ∈ [0,1]
    ("q213_chain_ndcg", "hit_at_k"),       // rate ∈ [0,1]
    ("q219_rfm_segments", "avg_monetary"),    // mean of positive cents
    ("q225_isotonic_calibration", "raw_rate"), // rate ∈ [0,1]
    ("q225_isotonic_calibration", "iso_rate"), // max-min of rates ∈ [0,1]
    ("q222_windowed_funnel", "view_to_click"),    // rate ∈ [0,1]
    ("q222_windowed_funnel", "view_to_purchase"), // rate ∈ [0,1]
    ("q215_k_anonymity", "pct_suppressed"),   // ratio of counts ∈ [0,1]
    ("q215_k_anonymity", "avg_l_diversity"),  // mean of counts ≥ 1
    ("q217_dim_ablation", "recall_at_10"),    // ratio of counts ∈ [0,1]
    ("q218_curriculum_order", "mean_pos"),    // mean of positions ≥ 1
    ("q214_ann_ndcg", "mrr"),              // mean of 1/rank ∈ [0,1]
    ("q214_ann_ndcg", "ndcg"),             // mean of 1/log2(1+rank) ∈ [0,1]
    ("q214_ann_ndcg", "hit_at_1"),         // rate ∈ [0,1]
    ("q214_ann_ndcg", "hit_at_10"),        // rate ∈ [0,1]
    ("q202_brier_decomposition", "base_rate"),
    ("q202_brier_decomposition", "brier"),
    ("q202_brier_decomposition", "reliability"),
    ("q202_brier_decomposition", "resolution"),
    ("q202_brier_decomposition", "uncertainty"),
    ("q202_brier_decomposition", "within_bin_var"),
    ("q32_centroid_norms", "centroid_norm"),
    ("q39_centroid_aggregator", "centroid_norm"),
    ("q93_pq_ann", "approx_dist"),
    ("q103_ann_recall", "recall"),
    ("q122_ivfpq_ann", "approx_dist"),
    ("q179_davies_bouldin", "scatter"),
    ("q179_davies_bouldin", "db_component"),
    ("q36_decode_meta", "avg_width"),
    ("q115_audio_meta", "avg_rate"),
    ("q116_video_meta", "avg_width"),
    ("q76_pagerank", "pr"),
    ("q80_triangle_census", "global_cc"),
    ("q112_personalized_pagerank", "pr"),
    ("q126_hits_authorities", "hub"),
    ("q126_hits_authorities", "auth"),
    ("q161_link_predict", "aa_score"),
    ("q189_local_clustering", "lcc"),
    ("q79_domain_budget", "avg_depth"),
    // r13 additions — all ratios/statistics nonnegative by construction:
    // recall = hits/total in [0,1]; intrinsic_dim = n·1e9/Σln μ with
    // μ ≥ 1 terms and a loud Σ=0 guard (so the served value is > 0);
    // t-closeness max_t/avg_t are total-variation distances in [0,1]
    ("q226_planted_dup_recall", "recall"),
    ("q227_planted_text_dup_recall", "recall"),
    ("q228_intrinsic_dim", "intrinsic_dim"),
    ("q229_t_closeness", "max_t"),
    ("q229_t_closeness", "avg_t"),
    // ratios in [0, 1] by construction
    ("q230_reshard_movement", "moved_frac"),
    ("q231_markov_eval", "accuracy"),
    ("q234_ngram_novelty", "novelty_rate"),
  )

  test("every rounded double output is noNegZero-finished or allowlisted nonnegative") {
    val rows = DiagSignedZero.audit(spark, sfDir)
    assert(rows.nonEmpty, "audit walked zero rounded double outputs - plumbing broke")
    val bare = rows.collect { case (q, c, false) => (q, c) }.toSet
    val unclassified = bare -- SignedZeroSafe
    assert(unclassified.isEmpty,
      s"rounded signed double outputs missing the Q.noNegZero finisher " +
        s"(add it in BOTH dialects or justify+allowlist): ${unclassified.toSeq.sorted.mkString(", ")}")
    val stale = SignedZeroSafe -- bare
    assert(stale.isEmpty,
      s"allowlist entries no longer bare (finished or renamed - prune them): " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every noNegZero-finished column carries '+ 0.0' in its oracle twin") {
    // the convention is TWO-sided: Q.noNegZero on the Spark side AND
    // the literal `+ 0.0` in the DuckDB SQL. The plan audit can only
    // see the Spark half; this closes the other — a finished Spark
    // column whose oracle twin lacks the idiom would ship the exact
    // r9 q194 divergence in reverse (Spark +0.0, DuckDB -0.0)
    val rows = DiagSignedZero.audit(spark, sfDir)
    val finished = rows.collect { case (q, c, true) => (q, c) }
    assert(finished.nonEmpty)
    val oracles = graft.SparkEntry.oracleSql
    val missing = finished.filter { case (q, c) =>
      oracles.get(q).exists { sql =>
        !s"""\\+\\s*0\\.0\\s+AS\\s+$c\\b""".r.findFirstIn(sql).isDefined
      }
    }
    assert(missing.isEmpty,
      s"finished Spark columns whose oracle SQL lacks the '+ 0.0' idiom " +
        s"before their alias: ${missing.sorted.mkString(", ")}")
  }

  test("noNegZero turns a rounded -0.0 into +0.0 (bit-exact)") {
    // round(-1e-12, 6) is the q194 shape: a tiny negative that DuckDB
    // rounds to -0.0. Spark's Round already yields +0.0; the finisher
    // must keep it +0.0 and must also normalize a raw -0.0 literal.
    val row = spark.range(1).select(
      Q.noNegZero(sqlRound(lit(-1e-12), 6)).as("a"),
      Q.noNegZero(lit(-0.0d)).as("b"),
      Q.noNegZero(sqlRound(lit(-1.5e-7), 6)).as("c"),
      Q.noNegZero(lit(Double.NaN)).as("n"),
      Q.noNegZero(lit(-2.5d)).as("x")).head()
    assert(java.lang.Double.doubleToRawLongBits(row.getDouble(0)) === 0L)
    assert(java.lang.Double.doubleToRawLongBits(row.getDouble(1)) === 0L)
    assert(java.lang.Double.doubleToRawLongBits(row.getDouble(2)) === 0L)
    assert(row.getDouble(3).isNaN)
    assert(row.getDouble(4) === -2.5d)
  }

  test("q194 on the degenerate template corpus emits +0.0 betas (the r9 red)") {
    // The sf0.001 documents corpus is template text whose per-source
    // vocabulary growth is flat - exactly the degenerate fit that made
    // heaps_beta/r2 land within one ulp of zero in round 9. Post-fix,
    // every zero in the output must be +0.0 bit-exactly.
    val rows = TextQueries.q194HeapsLaw.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- Seq(r.fieldIndex("heaps_beta"), r.fieldIndex("r2"))
         if !r.isNullAt(i)) {
      val v = r.getDouble(i)
      if (v == 0.0d)
        assert(java.lang.Double.doubleToRawLongBits(v) === 0L,
          s"negative zero leaked from q194: $r")
    }
  }
}
