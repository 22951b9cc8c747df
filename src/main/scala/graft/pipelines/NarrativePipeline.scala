package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The §3.1 narrative-generation pipeline (SURVEY.md), end to end:
  *
  *   read JSON-lines -> filter junk -> build Alpaca prompt with the
  *   serialized record -> external LLM call (STUBBED deterministically)
  *   -> validate '###' terminator -> strip it -> (name, content) sink
  *   rows, with per-record failures captured in a dead-letter column
  *   instead of aborting (the reference swallows per-record errors,
  *   generate_narratives_from_data.py:75-77).
  *
  * The reference fans out with a 64-thread pool (:99-100); here that is
  * task parallelism — repartition before the expensive map stage sizes
  * the fan-out.  The LLM call itself is a process/network boundary
  * outside engine scope (SURVEY §2.10): llmStub derives a deterministic
  * narrative from the prompt hash so the pipeline shape is testable.
  */
object NarrativePipeline {

  /** Deterministic stand-in for the vLLM chat call (DG:42-53). Emits a
    * '###'-terminated narrative for most records and simulates the
    * reference's observed failure modes (missing terminator / error) for
    * a deterministic slice. */
  def llmStub(prompt: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = crc32(prompt.cast("binary"))
    when(pmod(h, lit(17)) === 0, lit(null).cast("string"))          // call failed
      .when(pmod(h, lit(13)) === 0, concat(lit("narrative "), h))   // no terminator
      .otherwise(concat(lit("narrative "), h, lit(" ###")))
  }

  def run(spark: SparkSession, inputJsonl: String, parallelism: Int = 64): DataFrame = {
    val records = graft.sources.Formats
      .genomeRecordsTyped(spark, inputJsonl)
      .filter(col("_corrupt_record").isNull && col("genome_id").isNotNull)
      .drop("_corrupt_record")

    val prompts = records
      .repartition(parallelism) // the 64-way fan-out (DG:99-100)
      .select(col("genome_id"),
        concat(
          lit("Use the provided genome data to create a narrative.\n"),
          to_json(struct(col("genome_id"), col("genome_name"),
            col("pathway"), col("gene_count")))).as("prompt"))

    val responses = prompts.withColumn("raw", llmStub(col("prompt")))

    responses.select(
      col("genome_id"),
      concat(lit("narrative_"), col("genome_id"), lit(".txt")).as("file_name"),
      when(col("raw").isNotNull &&
          substring(col("raw"), -10, 10).contains("###"),
        regexp_replace(col("raw"), "###\\s*$", ""))
        .as("content"),
      when(col("raw").isNull, lit("llm_call_failed"))
        .when(!substring(col("raw"), -10, 10).contains("###"),
          lit("missing_terminator"))
        .as("error"))
  }
}
