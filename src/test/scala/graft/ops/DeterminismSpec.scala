package graft.ops

import graft.SparkSpec

/** Partition-count invariance: the catalog's answers must not depend on
  * how the shuffle happened to split the data. The DuckDB oracle gate
  * proves correctness at ONE partitioning; this pins the property that
  * makes those answers stable on a 1000-executor cluster — every
  * tie-break is total, every aggregation order-independent, so changing
  * `spark.sql.shuffle.partitions` (or cluster size) changes nothing.
  *
  * Queries chosen for shuffle-order hazard: q31 (minhash self-join,
  * pair emission order), q35 (iterative label propagation), q68 (fused
  * election + packing), q71 (argmax with deliberate tie-breaks), q67
  * (window argmax over join output), q79 (k-means training + probe
  * selection + in-cell ranking — three stacked tie-break surfaces),
  * q80 (mapPartitions codec round-trip).
  */
class DeterminismSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val probes = Seq("q31_minhash_pairs", "q35_dedup_clusters",
    "q67_click_attribution", "q68_corpus_prep", "q69_length_filter",
    "q71_best_successor", "q79_ann_ivf_multiprobe", "q80_ppm_decode",
    // q107: the bucketed frame decomposition re-associates decimal
    // additions across partitions — exactness of that re-association
    // is precisely what this property pins. q94/q106: stacked
    // tie-break surfaces (score/term, votes/label) over join output.
    "q94_bm25", "q106_knn_classify", "q107_anomaly",
    // q113: the corpus-wide argmax pair election must not depend on
    // which partition's candidate arrives first
    "q113_bpe_merge",
    // round-7 surfaces: q116 stacks ten elections (each the q113
    // hazard, compounding — round k's election depends on round k−1's
    // merge being byte-identical); q117 stacks probe selection + ADC
    // ties; q118's two-level training adds the sub-seeding argmin and
    // the sub-assignment argmax on top of q79's three surfaces
    "q116_bpe_train", "q117_ivfpq_multiprobe", "q118_ann_ivf_hier",
    // q119: integer-division means over partial-agg sums; q120 adds
    // the descent's two ranked-probe surfaces; q121 folds ten staged
    // merges whose election order round 1 already pinned
    "q119_perplexity_filter", "q120_hier_multiprobe", "q121_bpe_encode",
    // q122: banded self-join pair emission + distinct — q31's hazard
    // in Hamming space
    "q122_simhash_pairs",
    // q123: three full-outer joins over staged pair tables; q124: NN
    // argmin ties over a non-equi join; q125: mapPartitions codec
    // order (q80's hazard) + per-row fold
    "q123_dedup_agreement", "q124_image_embed", "q125_image_resize",
    // round-8 surfaces: q126 cross-joins five searches' staged top-5s
    // (each with its own rank ties) against the brute-force truth;
    // q127's max_by election ties on (quality, -doc_id); q128 stacks
    // q116's election hazard with a countDistinct stop decision; q129
    // reassembles position-ordered id sequences from an exploded
    // shuffle; q130 re-ranks an ADC shortlist whose own rank ties
    // decide membership
    "q126_recall_report", "q127_quality_survivors",
    "q128_bpe_vocab_train", "q129_bpe_token_ids", "q130_ivfpq_rerank",
    // round-9 surfaces: q131's per-label centroid election + argmax
    // classify ties; q132's weighted bottom-k rides md5-keyed rank
    // ties; q133 ranks four prefix-dim curves with per-(dims, query)
    // windows; q134's df groupBy + 1:1 join-back must not depend on
    // shingle arrival order; q135 compares two full index epochs
    "q131_centroid_classify", "q132_weighted_sample",
    "q133_matryoshka_recall", "q134_shingle_novelty",
    "q135_index_compaction",
    // q136: ADC shortlist rank ties decide membership through the
    // hier candidate cut, then exact-cosine re-rank ties; q137 stacks
    // three prefix-shortlist re-ranks on one ADC ranking
    "q136_hier_pq_rerank", "q137_rerank_width_report",
    // round-10 serving surfaces: q144 re-ranks after the tombstone
    // anti-join (mask order must not depend on partitioning); q145's
    // compound-key join + dense re-rank; q146 fuses two independently
    // ranked lists through a full-outer join — rank ties on BOTH
    // sides decide fused membership
    "q144_tombstone_ann", "q145_filtered_ann", "q146_hybrid_rrf",
    // q147: five greedy rounds each electing a per-query argmax over
    // double scores — any partition-order dependence in the window or
    // the maxsim update compounds across rounds
    "q147_mmr_diversify",
    // q148: q48's band-join candidate emission + min-elections, with
    // the corpus side arriving from staged parquet instead of the
    // shuffle that produced it
    "q148_ingest_dedup_staged",
    // q149: two stacked windows (per-source cap, then global top-5)
    // over the staged-search pool — cap membership rides rank ties
    "q149_source_capped_ann",
    // q150: four aggregate families (counts, sums, semi-join rate,
    // anti-join rate) meeting in one report row per language
    "q150_corpus_drift",
    // q151: every serving hazard stacked — anti-join mask, cap
    // windows, then five greedy rounds
    "q151_serving_stack",
    // late-round-14 surfaces: q180 is pure map arithmetic (the hazard
    // is only the presentation sort's stability); q181 ranks exact
    // cosines under the near-dup cut (rank ties decide the k set);
    // q182's greedy segmentation rides a collected vocab whose
    // TakeOrdered election must not depend on partitioning; q183's
    // landing-level election (min_by over a windowed cumsum) and
    // q184's hash-thresholded acceptance counts must both survive a
    // re-partitioned groupBy; q185 stacks the banded pair emission
    // with per-doc frame counts meeting in the all-frames fold
    "q180_fim_spans", "q181_hard_negatives", "q182_maxmatch_tokenize",
    "q183_token_budget", "q184_temperature_sample",
    // q185/q186: banded pair emission meeting per-doc frame counts in
    // the all-frames / delta-voting folds
    "q185_video_phash_pairs", "q186_video_clip_pairs",
    // q187: per-vector rank ties over the in-cell self-join
    "q187_knn_graph",
    // q188/q189: the staged-graph family — dup pre-collapse windows,
    // the capped symmetrization's per-target elections, the 2-hop
    // dedup, and the walk's per-round frontier elections must all
    // survive a re-partitioned shuffle
    "q188_knn_descent", "q189_graph_walk",
    // q190: |vocab|-keyed count shuffle meeting the survival rule;
    // q191: the sampled banded pair emission meeting per-doc SAMPLED
    // counts in the delta-voting fold
    "q190_unigram_mstep", "q191_video_cut_containment",
    "q192_graph_walk_masked", "q193_graph_walk_filtered",
    // q194: the ADC-priced frontier elections + the shortlist window
    // + the exact re-rank must all survive a re-partitioned shuffle
    "q194_graph_walk_pq_rerank",
    // q195: the compacted derivation's windows + the walk; q196: two
    // beam budgets' frontier elections + the deficiency branch
    "q195_graph_compacted_walk", "q196_graph_walk_escalated",
    // q197: the pruned per-round reads + frontier elections
    "q197_graph_walk_pruned",
    // q198: the convergence-driven descent's per-round top-k windows
    // + exceptAll termination + the walk over the converged graph
    "q198_graph_walk_converged")

  test("catalog answers are identical under a different shuffle partitioning") {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    // collectAsList keeps full row content (incl. doubles) in comparison
    def run(q: String) =
      graft.SparkEntry.queries(q)(spark, dir).collect().toSeq
    try {
      val at4 = probes.map(q => q -> run(q)).toMap
      spark.conf.set(key, "7") // coprime with 4: every hash key moves
      probes.foreach { q =>
        assert(run(q) == at4(q), s"$q differs between $orig and 7 partitions")
      }
    } finally spark.conf.set(key, orig)
  }
}
