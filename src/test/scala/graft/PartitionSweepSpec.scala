package graft

/** Scale-out sweep mirroring the reference's multi-rank parametrization
  * (testing.py:321-339): the same query must produce identical results at
  * shuffle-partition counts 1, 2, 4, 8.
  */
class PartitionSweepSpec extends SparkSuite {

  private val sweepQueries = Seq(
    "q16_groupby_q1", "q22_join_inner", "q13_sort_multikey",
    "q10_distinct", "q27_join_nullsafe", "q40_dedup_exact",
    "q46_minhash_lsh", "q49_cosine_top1", "q52_sessionize",
    "q81_dedup_clusters", "q82_range_join", "q89_asof_tolerance",
    "q90_repetition", "q92_bm25", "q94_quantize_int8",
    "q95_boilerplate", "q98_corpus_screen", "q99_quantized_top1",
    "q101_decontaminate", "q102_pack_sequences",
    "q73_first_last", "q107_arrow_roundtrip", "q108_slice_negative",
    "q109_simhash_portable", "q110_sort_nulls",
    "q146_group_outliers", "q147_retention", "q148_join_cardinality",
    "q149_brand_affinity", "q150_ohlc_bars", "q152_histogram",
    // round-8 additions. q163's ranks and q164's codebooks involve
    // FP-associativity-sensitive double sums (rounded in-query to 8/4
    // digits, far above the 1e-15 partition-order jitter); the rest are
    // exact integer/count/rounded-per-row outputs.
    "q156_asof_bucketed", "q158_jaro_winkler", "q160_transitions",
    "q162_equidepth_hist", "q163_pagerank",
    // round-8 continuation: TPC-H shapes with int64-exact thresholds
    // (q178/q179), the grid radius join (double-exact distance compares),
    // row index (rank under explicit total order), SCD2/gaps-islands
    // (integer window arithmetic), feature hashing (portable fold), and
    // the RangeJoinRewrite path (q197 leaves its conf set; the rewrite
    // must be partition-invariant like the manual q82)
    "q178_tpch_q17", "q179_tpch_q22", "q187_gaps_islands", "q188_scd2",
    "q191_grid_radius_join", "q194_feature_hashing", "q195_row_index",
    "q197_auto_range_join", "q204_tpch_q2", "q212_triangles",
    "q213_token_budget_mix", "q215_topk_aggregator",
    // round-9: CC (iterative star contraction must converge to the same
    // labeling on any partitioning), Benford ppm (integer window shares),
    // host caps (row_number under explicit total order), TWAP (lead over
    // a pinned (ts, event_id) tie order), try_* agg (exact int64 sums)
    "q222_connected_components", "q223_benford", "q226_host_cap",
    "q227_twap", "q231_try_arith",
    // bigram ppm (pure int64 arithmetic) and quantile normalization
    // (IEEE-fixed interpolation over the partition-invariant global CDF)
    "q233_bigram_familiarity", "q234_quantile_norm",
    // survivorship (IGNORE NULLS carry under pinned tie order) and
    // linear interpolation (spine windows, int64-exact arithmetic)
    "q237_survivorship", "q238_linear_interp",
    // skyline (exact staircase), A/B z and Gini (fixed IEEE trees over
    // exact int64 aggregates)
    "q239_skyline", "q240_ab_lift", "q241_gini",
    // calibration (pure int64) and trending (exact cents + bounded-set
    // rank windows)
    "q242_calibration", "q243_trending",
    // bag set ops (exact multiplicities) and ordered-set aggregates
    // (exact quantities per group)
    "q245_setops_all", "q246_percentile_disc",
    // BFS (deterministic frontier expansion), masking (row-local), and
    // journey regexes (pinned string_agg order)
    "q247_bfs_distance", "q248_mask", "q249_pattern_match",
    // bootstrap replicates are pure int64 hash arithmetic
    "q250_bootstrap_ci",
    // SCD2 as-of lookup (deterministic carry under pinned tie order) and
    // the source contamination matrix (exact verified pair set)
    "q251_temporal_dim_join", "q252_dup_rate_by_source",
    // round-10: the custom physical as-of join (must be invariant to the
    // incoming partitioning — EnsureRequirements re-clusters it), plus the
    // sketch/eval family (integer-exact or rounded far above FP jitter)
    "q254_asof_exec", "q255_max_drawdown", "q256_auc",
    "q257_log2_histogram", "q258_count_min", "q259_pmi",
    "q260_weighted_median", "q261_vocab_build", "q262_inverted_index",
    // q264: HLL union is associative+commutative for a fixed lgConfigK, so
    // the merged estimate is partitioning-invariant too
    "q263_ndcg_eval", "q264_hll_merge",
    "q265_chi_square", "q266_rolling_corr", "q267_exact_k_sample",
    "q268_asof_exec_fwd", "q269_user_growth", "q270_wow_growth",
    "q271_bitmap_distinct", "q272_ks_test", "q273_cohort_ltv",
    "q274_group_by_all", "q275_explode_outer", "q276_sorted_neighborhood",
    "q277_containment",
    // round-9: decimal unary surface (exact integer outputs) and the
    // sessionized-TWAP batch twin (int64 interval sums, pinned tie order)
    "q278_decimal_unary", "q279_session_twap",
    // round-9 continuation: chunking (row-local slices + md5), diversity/
    // richness (exact integer ppm over grouped counts), source TVD (exact
    // int64 numerator; the one IEEE divide runs on identical operands at
    // any partitioning)
    "q280_rag_chunking", "q281_char_diversity", "q282_lexical_richness",
    "q283_source_tvd",
    // boilerplate scrub (md5 of position-ordered rebuild, exact counts)
    // and class coherence (pinned-pos-order IEEE folds over exact sums)
    "q284_boilerplate_scrub", "q285_class_coherence",
    // kappa (one divide on exact int64 cells), temperature mix (pinned
    // source-order fold), label propagation (synchronous min-label rule is
    // a pure function of the edge set), OOV (total-order top-k vocab)
    "q286_annotator_kappa", "q287_temperature_mix",
    "q288_label_propagation", "q289_oov_rate",
    // BPE merge (exact integer greedy counts; top pair from a full agg with
    // lexicographic tiebreak), JL projection (pinned-order folds over a
    // driver-side sign matrix), group folds (rank over the bounded
    // group-summary frame on a total order)
    "q290_bpe_merge", "q291_random_projection", "q292_group_fold",
    // round-10: substring-removal dedup (md5 of position-ordered rebuild,
    // exact counts — the q284 invariance argument verbatim), hashed-bigram
    // classifier (portable-hash buckets + exact int64 dot), iterated BPE
    // (per-round winner from a full agg under a total order; greedy rewrite
    // is row-local)
    "q293_dupspan_scrub", "q294_quality_classifier", "q295_bpe_train",
    // contrastive triples: seeded LSH planes, pair-set dedup, and top-1
    // selection under the (cosine desc, id asc) total order
    "q296_contrastive_pairs",
    // bigram surprisal (exact integer floor-log2 bits over grouped counts),
    // Gopher rules and NFC normalization (row-local exact outputs)
    "q297_bigram_surprisal", "q298_gopher_rules", "q299_unicode_normalize",
    // the end-to-end funnel: all four stage flags are exact integers and
    // every stage is individually sweep-registered
    "q300_curation_pipeline",
    // round-11: incremental funnel (min-merge + exact integer deltas over
    // hash-sharded state — arrival split is fixed by doc_id % 3, state
    // merge is a keyed min), mixture materialization (integer isqrt
    // weights, hash-ordered prefix fill, bounded explode), image-text
    // alignment (row-local exact-int64 cosine threshold)
    "q301_incremental_curation", "q302_mixture_materialization",
    "q303_image_text_alignment",
    // incremental near-dup: banded candidates + exact integer signature
    // agreement under a pinned (batch, id) order — arrival order fixed by
    // staged file mod-times, signatures partition-invariant
    "q304_incremental_neardup",
    // the composed incremental funnel: near-dup keep-first under arrival
    // order pinned by the two maintain calls (b1 staged after the first),
    // exact dedup retraction-exact, deltas exact integers
    "q305_incremental_funnel",
    // round-12: incremental span screen (gram-count crossings + coverage
    // set-union are exact integer state under a fixed doc_id % 3 split),
    // compacted near-dup (fold preserves rows bit-for-bit; keep-first
    // order rides the preserved batch column)
    "q306_incremental_spanscreen", "q307_compacted_neardup",
    // full incremental q300: every stage exact-integer, report join keyed
    "q308_incremental_full_funnel",
    // incremental IVF: deterministic centroids (ordered init, fixed
    // iters), exact cosine at nprobe = nlist, (cosine desc, id asc) ties
    "q309_incremental_ivf")

  test("results are partition-count invariant") {
    for (q <- sweepQueries) {
      val results = Seq(1, 2, 4, 8).map { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p)
        try rows(SparkEntry.queries(q)(spark, sfDir)).map(_.toString)
        finally spark.conf.set("spark.sql.shuffle.partitions", 4)
      }
      assert(results.distinct.size == 1,
        s"$q differs across partition counts: sizes=${results.map(_.size)}")
    }
  }
}
