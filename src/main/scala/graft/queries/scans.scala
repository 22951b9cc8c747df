package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** §2.1 Scans / sources / sinks (SURVEY.md S1–S10) and §2.2 scalar
  * projections / filters / string / regex / JSON functions (F1–F12).
  *
  * Every query is a pure (SparkSession, sfDir) => DataFrame over the
  * driver's fixture tables, paired with a DuckDB oracle.  Determinism
  * rules (see graft.Det): integer outputs are BIGINT on both sides, no
  * raw float aggregation, no array-typed output columns.
  *
  * Reference behaviors cited per-query (paths relative to /root/reference/).
  */
object ScanQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def events(s: SparkSession, d: String) = Tables.events(s, d)

  /** Simulated TSV lines built from `documents`: `#`-comment rows for
    * doc_id % 97 == 0, else `source<TAB>lang<TAB>doc_id`.  Mirrors the
    * rubric-file format of rag_evaluation/RAG-eval-test_model.py:122-129. */
  private def tsvLines(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      when(col("doc_id") % 97 === 0,
        concat(lit("# skip "), col("doc_id")))
        .otherwise(concat_ws("\t", col("source"), col("lang"), col("doc_id")))
        .as("line"))

  private val tsvLinesSql =
    """SELECT doc_id, CASE WHEN doc_id % 97 = 0
      | THEN concat('# skip ', doc_id)
      | ELSE concat_ws(chr(9), source, lang, doc_id) END AS line
      |FROM documents""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- S1
    QueryDef(
      "scan_text_lines",
      (s, d) => docs(s, d)
        .filter(length(trim(col("text"))) > 2)
        .select(col("doc_id"), col("text")),
      Some("SELECT doc_id, text FROM documents WHERE length(trim(text)) > 2"),
      "Newline-delimited corpus scan with the reference's short-line drop " +
        "(data_generation/generate_narratives_from_data.py:79-85)."),

    // ---------------------------------------------------------------- S2
    QueryDef(
      "scan_json_records",
      (s, d) => events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_num")),
      Some("SELECT event_id, props->>'$.k' AS k_str, " +
        "(props->>'$.k')::BIGINT AS k_num FROM events"),
      "One-JSON-record-per-line scan; fields consumed downstream " +
        "(generate_narratives_from_data.py:36,94)."),

    // ---------------------------------------------------------------- S3
    QueryDef(
      "scan_tsv_comments",
      (s, d) => tsvLines(s, d)
        .filter(!col("line").startsWith("#"))
        .select(
          col("doc_id"),
          split(col("line"), "\t").getItem(0).as("f0"),
          split(col("line"), "\t").getItem(1).as("f1")),
      Some(s"""WITH lines AS ($tsvLinesSql)
        |SELECT doc_id, string_split(line, chr(9))[1] AS f0,
        |       string_split(line, chr(9))[2] AS f1
        |FROM lines WHERE NOT starts_with(line, '#')""".stripMargin),
      "TSV scan with #-comment skip and field split " +
        "(RAG-eval-test_model.py:123-129)."),

    // ---------------------------------------------------------------- S4
    QueryDef(
      "scan_dir_glob",
      (s, d) => docs(s, d)
        .filter(col("source").isin("src0", "src1", "src2"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars")),
      Some("SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars " +
        "FROM documents WHERE source IN ('src0','src1','src2') GROUP BY source"),
      "Directory-glob corpus scan, per-file provenance retained " +
        "(RAG-eval-test_model.py:237-238; DirectoryLoader glob)."),

    // ---------------------------------------------------------------- S5
    QueryDef(
      "scan_config_kv",
      (s, d) => Tables.region(s, d)
        .select(concat(upper(col("r_name")), lit("="), col("r_regionkey"))
          .as("line"))
        .select(split(col("line"), "=").getItem(0).as("key"),
          split(col("line"), "=").getItem(1).as("value"))
        .filter(col("key") === "ASIA"),
      Some("""WITH lines AS (
        |  SELECT concat(upper(r_name), '=', r_regionkey) AS line FROM region)
        |SELECT string_split(line, '=')[1] AS key,
        |       string_split(line, '=')[2] AS value
        |FROM lines WHERE string_split(line, '=')[1] = 'ASIA'""".stripMargin),
      "Single-value config read (token file, generate_narratives_from_data" +
        ".py:17-19; generate_auth_token.py:38-39): parse KEY=value lines, " +
        "select one key."),

    // ---------------------------------------------------------------- S6
    QueryDef(
      "sink_per_record_files",
      (s, d) => docs(s, d).select(
        concat(lit("narrative_"), col("doc_id"), lit(".txt")).as("file_name"),
        col("text").as("content")),
      Some("SELECT concat('narrative_', doc_id, '.txt') AS file_name, " +
        "text AS content FROM documents"),
      "One output file per record, prefix_<i>.txt naming " +
        "(generate_narratives_from_data.py:95-96), materialized as a " +
        "(name, content) table; the physical fan-out writer is " +
        "df.write.partitionBy at scale."),

    // ---------------------------------------------------------------- S7
    QueryDef(
      "sink_append_summary",
      (s, d) => {
        val detail = docs(s, d).select(
          col("doc_id").cast("string").as("row_key"),
          lit("detail").as("kind"),
          col("n_chars").as("metric"))
        val summary = docs(s, d).agg(sum(col("n_chars")).as("metric"))
          .select(lit("total").as("row_key"), lit("summary").as("kind"),
            col("metric"))
        detail.unionByName(summary)
      },
      Some("""SELECT doc_id::VARCHAR AS row_key, 'detail' AS kind, n_chars AS metric FROM documents
        |UNION ALL
        |SELECT 'total', 'summary', sum(n_chars)::BIGINT FROM documents""".stripMargin),
      "Detail rows plus appended summary line in one result file " +
        "(RAG-eval-test_model.py:143,151-153) as a typed union."),

    // ---------------------------------------------------------------- S8
    QueryDef(
      "sink_kv_config",
      (s, d) => Tables.region(s, d).select(
        concat(upper(col("r_name")), lit("="), col("r_regionkey")).as("line")),
      Some("SELECT concat(upper(r_name), '=', r_regionkey) AS line FROM region"),
      "KEY=value job-config emission (create_all_models.py:18-26)."),

    // ---------------------------------------------------------------- S9
    QueryDef(
      "sink_json_results",
      (s, d) => events(s, d)
        .filter(col("event_type") === "purchase")
        .select(
          concat(lit("run_"), col("event_id"), lit(".json")).as("result_path"),
          to_json(struct(col("event_id"), col("user_id"),
            col("event_type"))).as("payload")),
      Some("""SELECT concat('run_', event_id, '.json') AS result_path,
        | to_json(struct_pack(event_id := event_id, user_id := user_id,
        |                     event_type := event_type)) AS payload
        |FROM events WHERE event_type = 'purchase'""".stripMargin),
      "Per-run JSON result files keyed {out}_{...}.json " +
        "(test_all_models_llm_eval_sophia.py:50-51)."),

    // --------------------------------------------------------------- S11
    QueryDef(
      "scan_orc_roundtrip",
      (s, d) => {
        // Columnar-format interop: the same frame written as ORC and
        // read back must aggregate identically to the parquet original
        // (the oracle reads the parquet). Exercises Spark's second
        // first-class columnar reader end to end — type mapping,
        // predicate pushdown, vectorized decode.
        // unique per (session, dataset) + shutdown-cleaned: a fixed
        // shared path would let concurrent sessions / different sfDirs
        // clobber each other's round-trip mid-read
        val path = graft.Scratch.register(
          s"${System.getProperty("java.io.tmpdir")}/graft_orc_docs_" +
            s"${s.sparkContext.applicationId}_${graft.Scratch.tag(d)}")
        docs(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .filter(col("n_chars") > 0)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      },
      Some("""SELECT lang, count(*)::BIGINT AS n,
        | sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE n_chars > 0 GROUP BY lang""".stripMargin),
      "ORC write + read round-trip aggregated per language: format " +
        "interop is a data-plane guarantee (a 100 TB lake rarely has " +
        "one format), and the agg-after-reread proves values survive " +
        "the ORC type mapping bit-for-bit."),

    // --------------------------------------------------------------- S12
    QueryDef(
      "sink_csv_roundtrip",
      (s, d) => {
        // CSV is the hostile format: free text with commas, quotes and
        // newlines must survive write->read exactly (quote/escape mode,
        // multiLine read). Byte-identical text is asserted by summing
        // text lengths per language after the round-trip.
        // unique per (session, dataset) + shutdown-cleaned, as above
        val path = graft.Scratch.register(
          s"${System.getProperty("java.io.tmpdir")}/graft_csv_docs_" +
            s"${s.sparkContext.applicationId}_${graft.Scratch.tag(d)}")
        docs(s, d).select(col("doc_id"), col("lang"), col("text"))
          .write.mode("overwrite").option("header", "true")
          .option("escape", "\"").csv(path)
        s.read.option("header", "true").option("escape", "\"")
          .option("multiLine", "true")
          .schema("doc_id BIGINT, lang STRING, text STRING")
          .csv(path)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(length(col("text")).cast("long")).as("text_chars"),
            sum(conv(substring(md5(col("text")), 1, 8), 16, 10)
              .cast("long")).as("hash_sum"))
      },
      Some("""SELECT lang, count(*)::BIGINT AS n,
        | sum(length(text))::BIGINT AS text_chars,
        | sum(('0x' || substr(md5(text), 1, 8))::BIGINT)::BIGINT AS hash_sum
        |FROM documents GROUP BY lang""".stripMargin),
      "CSV write + multiLine read round-trip with a per-language " +
        "md5-prefix hash SUM over the text payload: quoting/escaping " +
        "must preserve every byte (the oracle hashes the ORIGINAL " +
        "parquet text, so any mangling breaks the compare). The " +
        "order-independent hash sum keeps the check " +
        "partition-layout-proof."),
  )
}

/** §2.2 scalar functions F1–F12. */
object ScalarQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- F1
    QueryDef(
      "filter_min_length",
      (s, d) => docs(s, d)
        .filter(length(trim(col("text"))) > 300)
        .select(col("doc_id"), length(col("text")).cast("bigint").as("len")),
      Some("SELECT doc_id, length(text)::BIGINT AS len FROM documents " +
        "WHERE length(trim(text)) > 300"),
      "len(strip(line)) > n keep-filter (generate_narratives_from_data.py:83)."),

    // ---------------------------------------------------------------- F2
    QueryDef(
      "filter_nonblank",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(" ")).otherwise(col("text")).as("line"))
        .filter(trim(col("line")) =!= "")
        .select(col("doc_id")),
      Some("""WITH lines AS (SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN ' ' ELSE text END AS line FROM documents)
        |SELECT doc_id FROM lines WHERE trim(line) <> ''""".stripMargin),
      "Blank-line skip (RAG-eval-create_model.py:60-62); blanks injected " +
        "deterministically since the fixture has none."),

    // ---------------------------------------------------------------- F3
    QueryDef(
      "filter_comment_prefix",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 97 === 0, concat(lit("# "), col("text")))
            .otherwise(col("text")).as("line"))
        .filter(!col("line").startsWith("#"))
        .select(col("doc_id")),
      Some("""WITH lines AS (SELECT doc_id,
        |  CASE WHEN doc_id % 97 = 0 THEN concat('# ', text) ELSE text END
        |    AS line FROM documents)
        |SELECT doc_id FROM lines WHERE NOT starts_with(line, '#')""".stripMargin),
      "Skip '#'-comment lines (RAG-eval-test_model.py:126); comments " +
        "injected deterministically since the fixture has none."),

    // ---------------------------------------------------------------- F4
    QueryDef(
      "project_split_fields",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        split(col("text"), " ").getItem(0).as("f0"),
        split(col("text"), " ").getItem(1).as("f1")),
      Some("SELECT doc_id, string_split(text, ' ')[1] AS f0, " +
        "string_split(text, ' ')[2] AS f1 FROM documents"),
      "split + positional field projection (RAG-eval-test_model.py:127-129)."),

    // ---------------------------------------------------------------- F5
    QueryDef(
      "prompt_template_concat",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        concat(
          lit("### Instruction: \nUse the provided input to create a narrative.\n"),
          lit("### Input: \n"), col("text"), lit("\n"),
          lit("### Response :\n")).as("prompt")),
      Some("""SELECT doc_id,
        | concat('### Instruction: ', chr(10),
        |  'Use the provided input to create a narrative.', chr(10),
        |  '### Input: ', chr(10), text, chr(10),
        |  '### Response :', chr(10)) AS prompt
        |FROM documents""".stripMargin),
      "Alpaca prompt templating (RAG-eval-create_model.py:55-67; " +
        "RAG-eval-test_model.py:173-185)."),

    // ---------------------------------------------------------------- F6
    QueryDef(
      "json_serialize_record",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("source"),
          col("n_chars"))).as("record_json")),
      Some("""SELECT doc_id, to_json(struct_pack(doc_id := doc_id,
        | lang := lang, source := source, n_chars := n_chars)) AS record_json
        |FROM documents""".stripMargin),
      "struct -> JSON string, json.dumps(record) into the prompt " +
        "(generate_narratives_from_data.py:29-37)."),

    // ---------------------------------------------------------------- F7
    QueryDef(
      "json_extract_field",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .filter(col("k") > 50),
      Some("SELECT event_id, (props->>'$.k')::BIGINT AS k FROM events " +
        "WHERE (props->>'$.k')::BIGINT > 50"),
      "JSON field extraction with typed downstream predicate " +
        "(record model of generate_narratives_from_data.py:36)."),

    // ---------------------------------------------------------------- F8
    QueryDef(
      "regex_strip_suffix",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        regexp_replace(
          concat(col("text"),
            when(col("doc_id") % 2 === 0, lit("###  ")).otherwise(lit(""))),
          "###\\s*$", "").as("cleaned")),
      Some("""SELECT doc_id, regexp_replace(
        |  concat(text, CASE WHEN doc_id % 2 = 0 THEN '###  ' ELSE '' END),
        |  '###\s*$', '') AS cleaned
        |FROM documents""".stripMargin),
      "Strip trailing '###'-terminator (generate_narratives_from_data.py:55-61); " +
        "terminator injected on even doc_ids."),

    // ---------------------------------------------------------------- F9
    QueryDef(
      "substr_tail_check",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        substring(
          concat(col("text"),
            when(col("doc_id") % 2 === 0, lit("###")).otherwise(lit(""))),
          -10, 10).contains("###").as("terminated")),
      Some("""SELECT doc_id, contains(right(
        |  concat(text, CASE WHEN doc_id % 2 = 0 THEN '###' ELSE '' END), 10),
        |  '###') AS terminated
        |FROM documents""".stripMargin),
      "'###' in content[-10:] terminator validation " +
        "(generate_narratives_from_data.py:69)."),

    // ---------------------------------------------------------------- F10
    QueryDef(
      "regex_word_boundary",
      (s, d) => docs(s, d)
        .filter(col("text").rlike("(?:^|\\W)join(?:$|\\W)"))
        .select(col("doc_id"), col("lang")),
      Some("""SELECT doc_id, lang FROM documents
        |WHERE regexp_matches(text, '(?:^|\W)join(?:$|\W)')""".stripMargin),
      "Answer-key relevance regex with non-word boundaries " +
        "(RAG-eval-test_model.py:131,136)."),

    // ---------------------------------------------------------------- F11
    QueryDef(
      "epoch_format_decimal",
      (s, d) => s.range(20, 420, 20).select(
        col("id").as("epoch_x100"),
        (col("id") / 100.0).cast("string").as("epoch_str")),
      Some("SELECT range AS epoch_x100, (range/100.0)::VARCHAR AS epoch_str " +
        "FROM range(20, 420, 20)"),
      "str(x/100) canonical numeric string keys " +
        "(create_all_models.py:39-40)."),

    // ---------------------------------------------------------------- F12
    QueryDef(
      "path_key_concat",
      (s, d) => s.range(20, 420, 20)
        .select(
          concat(lit("checkpoints/adapter"),
            (col("id") / 100.0).cast("string")).as("adapter_path"),
          concat_ws("_", lit("out"), (col("id") / 100.0).cast("string"),
            lit("mmlu"), lit("5")).as("result_key")),
      Some("""SELECT concat('checkpoints/adapter', (range/100.0)::VARCHAR) AS adapter_path,
        | concat_ws('_', 'out', (range/100.0)::VARCHAR, 'mmlu', '5') AS result_key
        |FROM range(20, 420, 20)""".stripMargin),
      "Composite run keys {prefix}{epoch}_{task}_{shots} " +
        "(create_all_models.py:45; test_all_models_llm_eval_sophia.py:49-51)."),
  )
}
