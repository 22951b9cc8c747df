package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the curation operators (oracle hash-parity is
  * the driver's job; these pin the properties the hashes can't express). */
class CurationSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("split_train_val_test partitions every document exactly once") {
    val agg = byName("split_train_val_test")
    val total = agg.agg(sum(col("n_docs"))).head().getLong(0)
    assert(total === Tables.documents(spark, sfDir).count())
    // hash-bucket split lands near 80/10/10 (binomial tolerance)
    val train = agg.filter(col("split") === "train")
      .select(col("n_docs")).head().getLong(0)
    assert(train.toDouble / total > 0.70 && train.toDouble / total < 0.90)
  }

  test("contamination hit counts are bounded by gram counts") {
    val c = byName("contamination_ngram_overlap")
    assert(c.filter(col("n_hits") > col("n_grams")).count() === 0)
    assert(c.filter(col("contaminated_permille") <= 0 ||
      col("contaminated_permille") > 1000).count() === 0)
    // eval docs themselves never appear on the train side
    assert(c.filter(pmod(col("doc_id"), lit(20)) === 7).count() === 0)
  }

  test("text_normalize output is canonical (charset + single spaces)") {
    val n = byName("text_normalize")
    assert(n.filter(!col("norm_text").rlike("^[a-z0-9 ]*$")).count() === 0)
    assert(n.filter(col("norm_text").contains("  ")).count() === 0)
    assert(n.filter(col("norm_len") =!= length(col("norm_text"))).count() === 0)
  }

  test("knn_graph emits exactly k=3 ranked neighbors per source, no loops") {
    val g = byName("knn_graph")
    assert(g.filter(col("src") === col("dst")).count() === 0)
    val perSrc = g.groupBy(col("src")).agg(
      count(lit(1)).as("n"), max(col("nn_rank")).as("mx"),
      min(col("nn_rank")).as("mn"))
    assert(perSrc.filter(col("n") =!= 3 || col("mx") =!= 3 ||
      col("mn") =!= 1).count() === 0)
  }

  test("zorder writer layout: range partitions by zcode are disjoint") {
    import org.apache.spark.sql.functions.spark_partition_id
    val z = byName("zorder_cluster").repartitionByRange(4, col("zcode"))
    val ranges = z.groupBy(spark_partition_id().as("pid"))
      .agg(min(col("zcode")).as("lo"), max(col("zcode")).as("hi"))
      .orderBy(col("lo")).collect()
    assert(ranges.length > 1)
    // each partition's zcode range ends before the next begins: the
    // min/max file statistics a writer records are non-overlapping
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"overlapping zcode ranges: $a vs $b")
    }
  }

  test("fullouter_reconcile covers the union of both activity sets") {
    val r = byName("fullouter_reconcile")
    val ev = Tables.events(spark, sfDir)
    val expected = ev
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id")).distinct().count()
    assert(r.count() === expected)
    assert(r.filter(col("n_started") === 0 && col("n_finished") === 0)
      .count() === 0)
  }
}
