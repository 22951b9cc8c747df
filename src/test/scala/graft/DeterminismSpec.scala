package graft

/** Automated proof of the engine's central determinism claim: results
  * are independent of physical partitioning. A representative sample
  * from every operator family runs under 3 and then 32 shuffle
  * partitions; row-set equality must hold exactly. (The DuckDB oracle
  * already pins one partitioning; this pins the claim ACROSS
  * partitionings — what AQE re-plans and cluster resizes do at 100 TB.)
  */
class DeterminismSpec extends SparkSpec {

  private val sample = Seq(
    "star_join_revenue",          // multi-join + fixed-point agg
    "line_dedup_global",          // global winner selection + reassembly
    "quantile_normalize_scores",  // global order statistics
    "dedup_minhash_lsh",          // banding/bucketing pipeline
    "interpolate_linear",         // window-frame float math
    "variance_fixed_point",       // integer-moment aggregation
    "cogroup_user_activity",      // typed cogroup folds
    "sample_fixed_per_group",     // hash-ordered windowed sampling
    "grouped_ols_trend",          // IEEE-tail over integer moments
    "idf_weighted_jaccard",       // blocked pair generation + weights
    "timeline_overlap_merge",     // running-max island windows
    "connected_components_largestar", // iterated star contraction
    "fuzzy_match_jw",             // native JW kernel over sorted blocks
    // round-4 continuation families
    "winnow_overlap_pairs",       // native kernel + fp index + containment
    "map_at_20",                  // windowed cumulative + integer AP terms
    "dsir_importance_proxy",      // 128-bit decimal ratio over broadcasts
    "collocation_pmi",            // global top-k over integer scores
    "mmr_rerank_top3",            // 3-round greedy argmax with tiebreaks
    "cuped_adjustment",           // pooled IEEE tail over integer moments
    "neyman_allocation",          // largest-remainder integer rounding
    "ols_residual_outliers",      // per-row residual vs broadcast fit
    "smith_waterman_pairs",       // row-local DP kernel
    "histogram_drift_l1",         // cross-multiplied TV distance
    // round-6 scalable-form families (ScalableIndex / ScalablePrefix:
    // partition-offset ranks and running aggregates must be exact under
    // any feeder partitioning)
    "mann_whitney_u",             // merged-histogram rank prefix
    "rfm_segmentation",           // 3 chained dense-index quintiles
    "zipf_coverage_curve",        // one-pass rank + coverage prefix
    "skyline_pareto",             // exclusive running max
    "abc_part_classification",    // range-partitioned revenue cumsum
    "dedup_embedding_cosine",     // LSH bucket join + native kernels
    "chunk_text_recursive",       // per-row recursive Generator
    // session batch: TPC-H closers + inference-planning + recursion
    "tpch_q2_min_cost_supplier",  // decorrelated min + deterministic cut
    "tpch_q15_top_supplier",      // 1-row max gate, tie set complete
    "prefix_cache_sharing",       // min/max string agg + native LCP
    "best_of_n_reward_curve",     // per-group combinatorial expectation
    "variant_shred_props",        // VARIANT parse + typed extraction
    "knn_bfs_hops",               // superstep BFS min-distance carry
    "knn_bfs_recursive_sql",      // UnionLoop recursion, same answer
    "listagg_sources_by_lang")    // ordered string agg: order contract

  for (name <- sample) {
    test(s"$name: identical rows under 3 vs 32 shuffle partitions") {
      val q = SparkEntry.registry.find(_.name == name).get
      val orig = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = q.fn(spark, sfDir).cache()
        a.count() // materialize under 3 partitions
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val b = q.fn(spark, sfDir).cache()
        try {
          assert(a.exceptAll(b).count() === 0, "rows lost at 32 parts")
          assert(b.exceptAll(a).count() === 0, "rows gained at 32 parts")
        } finally { a.unpersist(); b.unpersist() }
      } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
    }
  }
}
