package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Partition-count invariance audit: every result the engine reports must
  * be a pure function of the DATA, not of how Spark happened to split it.
  * On a cluster, partition counts change with input size, AQE decisions,
  * and executor counts — an operator whose output shifts with
  * `spark.sql.shuffle.partitions` (order-dependent aggregation, first/last
  * without a frame, greedy per-partition logic) silently corrupts results
  * at scale while passing any single-configuration test.
  *
  * The audited subset is the order-sensitive surface: window/sessionize
  * logic, collect_list folds, connected components, greedy clustering,
  * tiered matching, sketches, and the sequence packer. Coprime odd
  * partition counts (3, 13) maximize the reshuffling between runs.
  */
class DeterminismAuditSpec extends AnyFunSuite {

  private val Audited = Seq(
    "c1_field_diff", "c7_last_wins_dedup", "d5_tiered_match", "e5_weighted_avg",
    "h5_ordered_distinct", "i1_merge_groups", "i2_sessionize",
    "i3_adaptive_split", "p15_seq_pack", "p17_dedup_resolve", "p18_span_scrub",
    "p20_rep_signals", "p21_contamination", "p22_perplexity",
    "p28_shard_shuffle", "p29_domain_cap", "p30_ann_ivf_sq8",
    "pl2_ops_fold", "pl3_history_cluster",
    "pl4_merge_scoring", "x1_sketch_distinct", "x2_sketch_quantile",
    // round 9: the sketch/join/ranking additions — CMS cell counts,
    // HLL shard-union estimates, bucketized pair emission, Bloom
    // prefilter + semi-join, rounded-score window ranks, fixed-point
    // projection folds must all survive any partitioning
    "x4_countmin", "x5_hll_shard_merge", "d12_interval_join",
    "d13_bloom_semi_join", "p40_tfidf_keywords", "p41_random_projection",
    "d14_asof_forward", "p42_text_normalize", "p43_paragraph_dedup",
    "p44_video_frames", "p45_gram_matrix", "d15_asof_tolerance",
    // late round 9: integer PageRank ranks, the salted-join aggregate,
    // exact-integer drift selection, prefix-sum budget fill, and the
    // native as-of merge must be partitioning-invariant by construction
    "p46_pagerank", "d16_salted_join", "p47_corpus_drift",
    "p48_token_budget_mix", "d17_asof_native", "p49_label_propagation",
    // this session: frontier sets, broadcast-threshold sampling, window
    // dedup flags, prefix-blocked containment, and the ordered KN fold
    // must all be partitioning-invariant
    "p54_bfs", "p55_temperature_mix", "p56_url_dedup", "p57_containment",
    "p58_kneser_ney",
    // integer waterfilling + the p48 budget-fill machinery; integer-rank
    // fusion of two deterministic top-k relations
    "p60_unimax_mix", "p61_hybrid_rrf",
    // greedy argmax over rounded-6 sims with id tie-breaks; integer-count
    // NB model + position-ordered log folds
    "p62_mmr_diversify", "p63_naive_bayes",
    // the p46 integer recurrence with a seed-restricted teleport
    "p64_personalized_pagerank",
    // late round 9: histogram-cutoff buckets, the SNM global rank built
    // from range partitioning (THE partitioning-sensitive construction —
    // its invariance is the operator's core claim), ordered matvec folds,
    // KMV ball sketches, linkage log-odds, ordered eval folds, cohort /
    // funnel chains, and fixed-point AA sums
    "p65_ccnet_buckets", "p66_sorted_neighborhood", "p67_pca_power",
    "p69_pmi_cooccur", "p70_embed_standardize", "p71_hyperball",
    "p72_fellegi_sunter", "p73_ndcg", "p74_classifier_eval",
    "p75_adamic_adar", "i4_cohort_retention", "i5_funnel",
    // unique-id-ordered transitions; integer max-normalized HITS rounds
    "i6_transitions", "p76_hits",
    // grouping-set expansion and conditional-count pivot
    "h10_cube", "h11_pivot",
    // ordered EWMA fold; integer-cents frame sums
    "i7_ewma", "h12_moving_avg",
    // round 10: rendezvous argmax, the per-radius aggregate over KMV
    // sketches, and the Hilbert integer fold — invariant by construction
    // but cheap to guard (the previous round listed them as covered
    // without actually auditing them)
    "p68_hrw_shard", "p77_effective_diameter", "g16_hilbert_layout",
    // round 10 additions: per-doc BPE id reassembly (position-sorted
    // collect_list), BPE-count packing windows, anchor-rank keep-first +
    // island merge in the substring dedup and its scrub
    "p78_bpe_tokenize", "p80_bpe_pack", "p79_substr_dedup",
    "p81_substr_scrub",
    // map-only rolling-hash boundaries — invariant by construction —
    // and the distinct-doc dedup verdict over them
    "p82_cdc_chunks", "p87_cdc_dedup",
    // integer rank statistic over the score histogram; decimal-sum bins
    "p83_roc_auc", "p84_calibration",
    // row-local decode + hash; exact-hash grouping; banded hamming pairs
    "p85_image_dhash", "p86_audio_fingerprint", "p88_image_neardup",
    // round 11: connected-components keep-verdicts (image/audio), banded
    // pair joins with distinct, the order-sensitive video fingerprint
    // fold + its frame-level total-hamming verify, driver-side EM
    // (vocab collects must not depend on partitioning), the anchor
    // island merge against an eval set, and batched-BPE training whose
    // batch selection reads a top-K collect
    "p89_image_dedup_resolve", "p90_audio_neardup", "p91_unigram_vocab",
    "p92_video_neardup", "p93_substr_contamination", "p94_unigram_tokenize",
    "p95_audio_dedup_resolve", "p96_video_neardup_pairs",
    "p31_bpe_vocab")

  private def runAll(partitions: Int): Map[String, Seq[String]] = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName(s"determinism-audit-$partitions")
      .getOrCreate()
    try {
      val sf = "/root/testdata/sf0.001"
      Audited.map { name =>
        val rows = QueryCatalog.queries(name)(spark, sf)
          .collect().map(_.toString).toSeq
        name -> rows
      }.toMap
    } finally spark.stop()
  }

  test("order-sensitive queries return identical rows at 3 and 13 shuffle partitions") {
    val a = runAll(3)
    val b = runAll(13)
    val diffs = Audited.filter(n => a(n) != b(n))
    val detail = diffs.headOption.map { n =>
      s"; e.g. $n only@3=${a(n).diff(b(n)).take(3)} only@13=${b(n).diff(a(n)).take(3)}"
    }.getOrElse("")
    assert(diffs.isEmpty, s"partition-dependent results in $diffs$detail")
  }
}
