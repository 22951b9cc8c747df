package graft

import org.apache.spark.sql.functions._
import graft.pipelines.NarrativePipeline
import graft.sources.Formats

/** Reference input formats (FIXTURES.md §B) and the §3.1 composed
  * pipeline. */
class SourcesSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/$name").toString

  test("genome JSON-lines: good records parsed, junk dead-lettered") {
    // cache: Spark disallows querying only _corrupt_record on a raw scan
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val df = Formats.genomeRecordsTyped(spark, res("genome-records.jsonl"))
      .cache()
    val good = df.filter(col("_corrupt_record").isNull &&
      col("genome_id").isNotNull)
    assert(good.count() === 4)
    assert(good.filter(col("gene_count") === 42).count() === 1)
    // the 'x' junk line is captured, not fatal
    assert(df.filter(col("_corrupt_record").isNotNull).count() >= 1)
  }

  test("terms TSV: comments skipped, two fields") {
    val df = Formats.termsTsv(spark, res("terms.tsv"))
    assert(df.count() === 5)
    val row = df.filter(col("query_keyword") === "glucose").head()
    assert(row.getString(1) === "cpd00027")
    // regex-metachar answer keys survive
    assert(df.filter(col("answer_key") === "cpd00159").count() === 1)
  }

  test("binaryDir: raw file bytes arrive as one row per file with length") {
    val dir = res("terms.tsv").stripSuffix("terms.tsv")
    val df = Formats.binaryDir(spark, dir, "*.tsv")
    val rows = df.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0).endsWith("terms.tsv"))
    val bytes = r.getAs[Array[Byte]](2)
    assert(r.getLong(1) === bytes.length.toLong)
    // content round-trips bit-exact: matches the text-source view
    val viaText = Formats.termsTsv(spark, res("terms.tsv")).count()
    val asText = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    assert(asText.linesIterator.count(l =>
      l.nonEmpty && !l.startsWith("#")) === viaText)
    // glob pruning: no match -> no rows, schema intact
    assert(Formats.binaryDir(spark, dir, "*.nope").count() === 0)
  }

  test("narratives: short lines dropped, terminator stripped + flagged") {
    val df = Formats.narratives(spark, res("narratives.txt"))
    assert(df.count() === 4) // blank and 'x' dropped
    assert(df.filter(col("terminated")).count() === 3)
    assert(df.filter(col("narrative").contains("###")).count() === 0)
  }

  test("narrative pipeline: ok rows have content, failures dead-lettered") {
    val out = NarrativePipeline.run(spark, res("genome-records.jsonl"),
      parallelism = 4).cache()
    assert(out.count() === 4)
    val ok = out.filter(col("error").isNull)
    val bad = out.filter(col("error").isNotNull)
    assert(ok.count() + bad.count() === 4)
    assert(ok.filter(col("content").isNull).count() === 0)
    assert(ok.filter(col("content").contains("###")).count() === 0)
    assert(out.filter(!col("file_name").startsWith("narrative_")).count() === 0)
    out.unpersist()
  }
}
