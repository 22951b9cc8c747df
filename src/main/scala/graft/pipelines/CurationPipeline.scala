package graft.pipelines

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Corpus, Tables}

/** End-to-end curation run: the engine's operators composed into the
  * single job a pretraining ingest actually executes, with in-pass
  * metrics — the capstone proof that the pieces fit together, not just
  * pass their individual gates.
  *
  * Stages (each one an oracle-checked operator family elsewhere):
  *   1. exact dedup on content hash          (dedup_exact)
  *   2. winnowing near-dup removal            (winnow_overlap_pairs):
  *      fingerprint inverted index, containment >= 50% of the smaller
  *      set drops the larger doc_id — the MOSS pair stage in-line
  *   3. language gate                         (text_langid's substrate)
  *   4. Gopher-style quality rules            (gopher_quality_filter)
  *   5. length-outlier removal by exact p5/p95 (length_outlier_filter)
  *   6. k-anonymity release gate              (k_anonymity_violations):
  *      quasi-identifier classes (lang, 100-char length bucket) with
  *      fewer than 3 members are suppressed before release
  *   7. deterministic md5 train/val/test split  (split_train_val_test)
  *   8. per-split partitioned parquet write   (sink_per_record_files)
  *
  * Wide-stage budget: the dedup groupBy, the fingerprint index + pair
  * aggregation (near-dup), the p5/p95 aggregate, and the k-anonymity
  * class count — every other stage is a narrow transformation or a
  * broadcast-bounded join, so composition adds shuffles only where an
  * operator is genuinely wide. Metrics ride a Dataset.observe() so
  * counts cost no extra action: one write triggers the pipeline once.
  *
  * Reference: this is §3.1's generate-filter-write loop
  * (data_generation/generate_narratives_from_data.py:79-96) as one
  * declarative plan.
  */
object CurationPipeline {

  final case class Result(
      curatedPath: String,
      ingested: Long,
      afterDedup: Long,
      afterNearDup: Long,
      afterQuality: Long,
      afterKAnon: Long,
      written: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val obs = new Observation("curation")

    val ingested = Corpus.withDups(spark, sfDir)

    // 1. exact dedup: keep the minimum doc_id per content hash
    val deduped = ingested
      .withColumn("h", md5(col("text")))
      .withColumn("keeper", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("keeper"))
      .drop("h", "keeper")

    // 2. winnowing near-dup removal: containment >= 50% of the smaller
    // fingerprint set (after a 64-doc hot-fp cap) drops the LARGER id —
    // the winnow_overlap_pairs operator run as an anti join
    val fps = deduped.filter(length(col("text")) >= 11)
      .select(col("doc_id"),
        explode(graft.functions.WinnowKernel.winnowFps(col("text")))
          .as("fp"))
    val okFp = fps.groupBy(col("fp")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= 64).select(col("fp"))
    val cappedFps = fps.join(okFp, Seq("fp"))
    val fpSizes = cappedFps.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nf"))
    val dupLosers = cappedFps.as("x").join(cappedFps.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(fpSizes.select(col("doc_id").as("a"), col("nf").as("na")),
        Seq("a"))
      .join(fpSizes.select(col("doc_id").as("b"), col("nf").as("nb")),
        Seq("b"))
      .filter(col("n_shared") * 2 >= least(col("na"), col("nb")))
      .select(col("b").as("doc_id")).distinct()
    val nearDeduped = deduped.join(dupLosers, Seq("doc_id"), "left_anti")

    // 3+4. language + quality gates (pure row predicates); n_chars is
    // derived — withDups truncations change lengths, so never trust a
    // pre-computed stat across a mutating stage
    val toks = split(col("text"), " ")
    val gated = nearDeduped
      .withColumn("n_chars", length(col("text")).cast("long"))
      .filter(col("lang").isin("en", "de", "fr", "es", "zh"))
      .filter(size(toks) >= 10 && size(toks) <= 2048)
      .filter( // mean word length in [3, 12] — cross-multiplied
        col("n_chars") * 1 >= size(toks) * 3 &&
          col("n_chars") <= size(toks) * 13)

    // 4. length outliers out by exact percentile bounds (broadcast row)
    val bounds = gated.agg(
      expr("percentile(n_chars, 0.05)").as("p05"),
      expr("percentile(n_chars, 0.95)").as("p95"))
    val inRange = gated.crossJoin(broadcast(bounds))
      .filter(col("n_chars") >= ceil(col("p05")) &&
        col("n_chars") <= floor(col("p95")))
      .drop("p05", "p95")

    // 6. k-anonymity release gate: quasi-identifier classes (lang,
    // 100-char length bucket) under k=3 members are suppressed —
    // the k_anonymity_violations screen applied as a semi join on the
    // classes that pass
    val kClass = inRange
      .withColumn("kbucket", expr("(n_chars div 100)"))
    val okClasses = kClass.groupBy(col("lang"), col("kbucket"))
      .agg(count(lit(1)).as("kn"))
      .filter(col("kn") >= 3)
      .select(col("lang"), col("kbucket"))
    val released = kClass.join(okClasses, Seq("lang", "kbucket"))
      .drop("kbucket")

    // 7. deterministic split
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(100L))
    val curated = released
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test"))
      .observe(obs,
        count(lit(1)).as("written"),
        sum(col("n_chars")).as("chars_written"))

    // 8. one partitioned write drives the whole plan exactly once
    curated.write.mode("overwrite")
      .partitionBy("split").parquet(outDir)

    val written = obs.get("written").asInstanceOf[Long]
    Result(outDir,
      ingested = ingested.count(),
      afterDedup = deduped.count(),
      afterNearDup = nearDeduped.count(),
      afterQuality = gated.count(),
      afterKAnon = released.count(),
      written = written)
  }
}
