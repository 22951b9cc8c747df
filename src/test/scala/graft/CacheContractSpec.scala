package graft

/** The QueryDef cache contract (core.scala): queries may persist()
  * shared subtrees that outlive `fn`'s return, and the caller must
  * clearCache() after consuming each result. This spec pins both
  * halves: the persisting queries' blocks ARE live after the action
  * (the persist is real, not dead code), and one clearCache() drains
  * every SQL-cached block — no cache survives to starve the next
  * query's execution memory.
  *
  * Round 14 extension: iterative/unrolled queries now also use EAGER
  * `localCheckpoint(true)` to truncate exponentially self-referencing
  * plans (beam search rounds, BPE merge rounds, shared shingle/kNN
  * substrates — see OPTIMIZATION_r14.md).  Those blocks are NOT
  * SQL-cache entries, so clearCache() does not drop them; they are
  * owned by the RDD and reclaimed by ContextCleaner once the query's
  * frames are unreferenced.  The starvation property the contract
  * protects therefore becomes a BOUND instead of emptiness: after
  * clearCache(), whatever survives must be checkpoint residue of
  * bounded size (every checkpointed frame is a bounded beam/label/
  * shingle table, orders of magnitude under the execution-memory
  * budget), never an unbounded cached scan.
  */
class CacheContractSpec extends SparkSpec {

  // every registry query whose fn persists (grep persist( over
  // queries/): the minhash signature table, the simhash shingle
  // table, the MMR candidate unroll, the iterative CC labels (shared
  // by dedup_clusters/dedup_keep_best).
  // Round 15: exact_substring_spans and dsir_importance_proxy moved
  // their corpus-scale streams to per-invocation scratch parquet
  // (Scratch.materialize) and persist nothing anymore — the registry
  // holds NO corpus-sized persist/localCheckpoint; what remains is
  // bounded (shingle/signature/beam/label frames).  dedup_ngram_jaccard
  // and minhash_jaccard_estimate dropped their persists entirely when
  // they moved to the scan-side set form (ShingleHashes arrays per doc,
  // per-pair SortedIntersect — nothing shared left to cache).
  private val persistingQueries = Seq(
    "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
    "dedup_keep_best", "mmr_rerank_top3", "ann_graph_hier_topk",
    "ann_index_insert")

  // PER-QUERY checkpoint-residue allowance (tightened round 15, was a
  // cumulative 256 MiB): every localCheckpointed frame in the registry
  // is a bounded substrate (edge lists, beams, label frames, shingle
  // tables at spec scale) — far below this line.  A query that trips
  // it is caching something corpus-sized and must be fixed.  Asserted
  // on the per-query DELTA (storage added by this query and not freed
  // by clearCache), so residue from earlier suites/queries in the
  // shared session cannot mis-attribute a leak.
  private val residueBudgetBytes = 64L << 20

  private def storedBytes: Long =
    spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum

  test("persisting queries leave blocks; one clearCache drains SQL caches") {
    spark.catalog.clearCache()
    persistingQueries.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(fail(s"$name not in registry"))
      val before = storedBytes
      q.fn(spark, sfDir).queryExecution.toRdd.count()
      val live = spark.sparkContext.getPersistentRDDs.size
      assert(live > 0, s"$name no longer persists anything — remove it " +
        "from persistingQueries so the contract list stays exact")
      spark.catalog.clearCache()
      val residue = math.max(0L, storedBytes - before)
      assert(residue < residueBudgetBytes,
        s"$name added ${residue >> 20} MiB of storage surviving " +
          "clearCache — checkpoint residue must stay bounded (see " +
          "scaladoc)")
    }
  }

  test("non-persisting registry queries leave storage untouched") {
    spark.catalog.clearCache()
    // checkpoint residue from EARLIER suites/queries in this shared
    // session may legitimately linger until ContextCleaner runs, so
    // assert these queries add no NEW persistent RDDs rather than
    // absolute emptiness
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    Seq("count_by_group", "cosine_topk", "pack_sequences",
      "percent_rank_cume")
      .foreach { name =>
        SparkEntry.registry.find(_.name == name).get
          .fn(spark, sfDir).queryExecution.toRdd.count()
        val added =
          spark.sparkContext.getPersistentRDDs.keySet -- baseline
        assert(added.isEmpty,
          s"$name persisted blocks ($added) without being in the " +
            "contract list")
      }
  }
}
