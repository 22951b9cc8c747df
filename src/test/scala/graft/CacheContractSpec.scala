package graft

/** The QueryDef cache contract (core.scala): queries may persist()
  * shared subtrees that outlive `fn`'s return, and the caller must
  * clearCache() after consuming each result. This spec pins both
  * halves: the persisting queries' blocks ARE live after the action
  * (the persist is real, not dead code), and one clearCache() drains
  * every one of them — no block survives to starve the next query's
  * execution memory.
  */
class CacheContractSpec extends SparkSpec {

  // every registry query whose fn persists (grep persist( over
  // queries/): the minhash signature table, the simhash/ngram shingle
  // tables, the jaccard-estimate verify, the MMR candidate unroll, and
  // the iterative CC labels (shared by dedup_clusters/dedup_keep_best)
  private val persistingQueries = Seq(
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "minhash_jaccard_estimate", "dedup_clusters", "dedup_keep_best",
    "mmr_rerank_top3", "ann_graph_hier_topk", "ann_index_insert")

  test("persisting queries leave blocks; one clearCache drains them all") {
    spark.catalog.clearCache()
    persistingQueries.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(fail(s"$name not in registry"))
      q.fn(spark, sfDir).queryExecution.toRdd.count()
      val live = spark.sparkContext.getPersistentRDDs.size
      assert(live > 0, s"$name no longer persists anything — remove it " +
        "from persistingQueries so the contract list stays exact")
      spark.catalog.clearCache()
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"clearCache left ${spark.sparkContext.getPersistentRDDs.size} " +
          s"persisted RDDs behind after $name — the caller contract " +
          "cannot drain this query")
    }
  }

  test("non-persisting registry queries leave storage untouched") {
    spark.catalog.clearCache()
    Seq("count_by_group", "cosine_topk", "pack_sequences",
      "percent_rank_cume")
      .foreach { name =>
        SparkEntry.registry.find(_.name == name).get
          .fn(spark, sfDir).queryExecution.toRdd.count()
        assert(spark.sparkContext.getPersistentRDDs.isEmpty,
          s"$name persisted blocks without being in the contract list")
      }
  }
}
