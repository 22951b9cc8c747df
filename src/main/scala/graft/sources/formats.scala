package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the reference's input formats (FIXTURES.md §B), built on
  * spark.read so pushdown/pruning and multi-file parallelism come free.
  * Each mirrors a concrete reference consumption site. */
object Formats {

  /** JSON-lines genome records with schema inference, dropping the
    * blank/short junk lines the reference skips
    * (data_generation/generate_narratives_from_data.py:79-85).
    * Corrupt lines land in `_corrupt_record` (dead-letter column) rather
    * than failing the scan — PERMISSIVE is the right default when one bad
    * record must not kill a 100 TB read. */
  def genomeRecords(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Same, with an explicit schema: at scale you never pay the inference
    * pass twice — declare once, reuse everywhere. */
  val genomeSchema: StructType = StructType(Seq(
    StructField("genome_id", StringType),
    StructField("genome_name", StringType),
    StructField("pathway", StringType),
    StructField("gene_count", LongType),
    StructField("_corrupt_record", StringType)))

  def genomeRecordsTyped(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(genomeSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Retrieval rubric TSV with '#' comments
    * (rag_evaluation/RAG-eval-test_model.py:122-129): query_keyword TAB
    * answer_key. */
  def termsTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("comment", "#")
      .schema(StructType(Seq(
        StructField("query_keyword", StringType),
        StructField("answer_key", StringType))))
      .csv(path)

  /** Line-oriented narrative corpus with the reference's line hygiene:
    * drop blank/short lines (len(strip) > 2,
    * generate_narratives_from_data.py:83) and strip the '###' terminator
    * (:55-61,69-70). */
  def narratives(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 2)
      .select(
        regexp_replace(col("value"), "###\\s*$", "").as("narrative"),
        substring(col("value"), -10, 10).contains("###").as("terminated"))

  /** Directory-glob corpus scan with provenance
    * (rag_evaluation/RAG-eval-test_model.py:237-238). */
  def corpusDir(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read
      .option("pathGlobFilter", glob)
      .text(dir)
      .select(col("value").as("line"), input_file_name().as("source_file"))

  /** Raw-binary ingest for multimodal payloads: each matched file becomes
    * one row (path, modificationTime, length, content binary) — the
    * entry point that feeds MediaSource's decode/feature stages when
    * media arrives as files rather than parquet binary columns. The
    * built-in binaryFile source streams file bytes into the row without
    * driver-side reads, prunes on path/length pushdown, and at 100 TB is
    * governed by spark.sql.files.maxPartitionBytes like any scan; files
    * larger than a partition stay single-row (binary payloads are
    * opaque), so pathological file sizes belong in an object-store
    * chunking layer upstream. */
  def binaryDir(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"), col("content"))
}
