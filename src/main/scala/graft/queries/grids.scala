package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The reference's experiment control plane: parameter grids built from
  * arithmetic ranges, cartesian products, and filesystem-existence joins
  * (SURVEY.md §1.5, §2.3, §2.4, §2.7).
  *
  * Grid dimensions come straight from the reference:
  *  - adapter domains: train_adapters/create_all_models_json_data.py:29,
  *    llm_harness_evaluation/test_all_models_llm_eval_sophia.py:38
  *  - epoch grid range(20,420,20)/100: train_adapters/create_all_models.py:39-40
  *  - task/num_shot pairs: test_all_models_llm_eval_sophia.py:39
  *
  * At 100 TB these grids stay tiny (hundreds of rows) — they are the
  * broadcast side of every join here; the scale-out side is the completed-run
  * ledger, which arrives as a parquet scan.
  */
object Grids {
  val adapterNames: Seq[String] = Seq(
    "bioset_result", "genome_amr", "genomes",
    "bioset_result_1person", "genome_amr_1person", "genomes_1person")

  val taskShots: Seq[(String, Int)] = Seq(
    ("winogrande", 5), ("truthfulqa", 0), ("arc_challenge", 25),
    ("hellaswag", 10), ("mmlu", 5), ("gsm8k", 5))

  def adapters(s: SparkSession): DataFrame = {
    import s.implicits._
    adapterNames.toDF("adapter")
  }

  val adaptersSql: String =
    adapterNames.map(a => s"('$a')").mkString("(VALUES ", ",", ") ad(adapter)")

  def tasks(s: SparkSession): DataFrame = {
    import s.implicits._
    taskShots.toDF("task", "num_shot")
  }

  val tasksSql: String =
    taskShots.map { case (t, n) => s"('$t',$n)" }
      .mkString("(VALUES ", ",", ") tk(task, num_shot)")

  /** Epoch grid: epoch_x100 in 20..400 step 20, epoch_str = str(x/100). */
  def epochs(s: SparkSession): DataFrame =
    s.range(20, 420, 20).select(
      col("id").as("epoch_x100"),
      (col("id") / 100.0).cast("string").as("epoch_str"))

  val epochsSql: String =
    "(SELECT range AS epoch_x100, (range/100.0)::VARCHAR AS epoch_str " +
      "FROM range(20, 420, 20)) ep"

  /** adapter x epoch grid with composite run key {adapter}{epoch}. */
  def grid(s: SparkSession): DataFrame =
    adapters(s).crossJoin(epochs(s))
      .select(col("adapter"), col("epoch_x100"), col("epoch_str"),
        concat(col("adapter"), col("epoch_str")).as("run_key"))

  val gridSql: String =
    s"""(SELECT adapter, epoch_x100, epoch_str,
       |  concat(adapter, epoch_str) AS run_key
       | FROM $adaptersSql CROSS JOIN $epochsSql) grid""".stripMargin

  /** Deterministic "already completed" subset of the grid, standing in for
    * os.path.exists(adapter_path) (create_all_models.py:43-47). */
  def done(s: SparkSession): DataFrame =
    grid(s).filter((col("epoch_x100") / 20 + length(col("adapter"))) % 3 === 0)

  val doneSql: String =
    s"""(SELECT * FROM $gridSql
       | WHERE (epoch_x100 // 20 + length(adapter)) % 3 = 0) done""".stripMargin
}

/** §2.3 sampling / ids / ordering / limits (O1–O5). */
object OrderQueries {
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- O1
    QueryDef(
      "sample_subset",
      (s, d) => docs(s, d)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3"))
        .select(col("doc_id"), col("source")),
      Some("SELECT doc_id, source FROM documents " +
        "WHERE substr(md5(doc_id::VARCHAR), 1, 1) IN ('0','1','2','3')"),
      "random.sample subset (generate_narratives_from_data.py:39-40) made " +
        "deterministic: md5-prefix Bernoulli sample (~25%), the same trick " +
        "used for reproducible sampling at cluster scale."),

    // ---------------------------------------------------------------- O2
    QueryDef(
      "zip_with_index",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        (row_number().over(Window.orderBy(col("doc_id"))) - 1).cast("bigint")
          .as("idx"),
        concat(lit("narrative_"),
          row_number().over(Window.orderBy(col("doc_id"))) - 1, lit(".txt"))
          .as("out_name")),
      Some("""SELECT doc_id, (row_number() OVER (ORDER BY doc_id) - 1) AS idx,
        | concat('narrative_', row_number() OVER (ORDER BY doc_id) - 1,
        |        '.txt') AS out_name
        |FROM documents""".stripMargin),
      "enumerate-style dense output indices (generate_narratives_from_data" +
        ".py:95-96); row_number, NOT monotonically_increasing_id (not dense). " +
        "Global window = single-partition sort: fine for naming ~1e3 outputs, " +
        "use zipWithIndex/partition offsets if the indexed set itself is huge."),

    // ------------------------------------------------------- O2 at scale
    QueryDef(
      "zip_with_index_scalable",
      (s, d) => graft.operators.ScalableIndex
        .withDenseIndex(docs(s, d).select(col("doc_id")), "doc_id", 8)
        .select(col("doc_id"), col("idx")),
      Some("""SELECT doc_id, (row_number() OVER (ORDER BY doc_id) - 1) AS idx
        |FROM documents""".stripMargin),
      "The 100 TB form of zip_with_index: dense 0-based global index via " +
        "range-partition by the order key + sortWithinPartitions + " +
        "RDD.zipWithIndex partition offsets — total order preserved, " +
        "indices dense, and NO single-partition global window (each task " +
        "holds only its own range partition; the only extra cost is " +
        "zipWithIndex's one count job over partitions). Oracle-gated to " +
        "be value-identical to the windowed form."),

    // ---------------------------------------------------------------- O3
    QueryDef(
      "order_by_length",
      (s, d) => graft.operators.ScalableIndex.withDenseIndex(
        docs(s, d).select(col("doc_id"), length(col("text")).as("len_")),
        Seq(col("len_"), col("doc_id")), 8, "idx")
        .select(col("doc_id"), (col("idx") + 1L).as("batch_pos")),
      Some("""SELECT doc_id, row_number() OVER (ORDER BY length(text), doc_id)
        | AS batch_pos FROM documents""".stripMargin),
      "group_by_length batching = sort by text length " +
        "(RAG-eval-create_model.py:142). Executed as ScalableIndex " +
        "(range partition on (length, doc_id) + per-partition offsets) " +
        "— same dense positions as the windowed row_number, no " +
        "single-partition sort."),

    // ---------------------------------------------------------------- O4
    QueryDef(
      "limit_topk",
      (s, d) => docs(s, d)
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id"), col("n_chars")),
      Some("SELECT doc_id, n_chars FROM documents " +
        "ORDER BY n_chars DESC, doc_id LIMIT 10"),
      "retriever k-cap / docs[:k] (RAG-eval-test_model.py:247-248); " +
        "deterministic via doc_id tiebreak. Spark plans TakeOrderedAndProject " +
        "— per-partition top-k then driver merge, no global sort."),

    // ---------------------------------------------------------------- O5
    QueryDef(
      "first_hit",
      (s, d) => docs(s, d)
        .filter(col("text").rlike("(?:^|\\W)scan(?:$|\\W)"))
        .groupBy(col("lang"))
        .agg(min(col("doc_id")).as("first_doc")),
      Some("""SELECT lang, min(doc_id) AS first_doc FROM documents
        |WHERE regexp_matches(text, '(?:^|\W)scan(?:$|\W)') GROUP BY lang""".stripMargin),
      "First matching rank only (RAG-eval-test_model.py:137-138)."),
  )
}

/** §2.4 joins (J1–J4, J6; J5 lives with the vector family). */
object JoinQueries {

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- J1
    QueryDef(
      "antijoin_completed",
      (s, d) => Grids.grid(s).join(
        Grids.done(s).select(col("run_key")), Seq("run_key"), "left_anti")
        .select(col("adapter"), col("epoch_str"), col("run_key")),
      Some(s"""SELECT adapter, epoch_str, run_key FROM ${Grids.gridSql}
        |WHERE run_key NOT IN (SELECT run_key FROM ${Grids.doneSql})""".stripMargin),
      "Skip grid point iff output exists (create_all_models.py:43-47; " +
        "test_all_models_llm_eval_sophia.py:50-53) — the work-remaining " +
        "anti-join. Grid side broadcasts; the done-ledger is the big side."),

    // ---------------------------------------------------------------- J2
    QueryDef(
      "semijoin_available",
      (s, d) => Grids.grid(s).join(
        Grids.done(s).select(col("run_key")), Seq("run_key"), "left_semi")
        .select(col("adapter"), col("epoch_str"), col("run_key")),
      Some(s"""SELECT adapter, epoch_str, run_key FROM ${Grids.gridSql}
        |WHERE run_key IN (SELECT run_key FROM ${Grids.doneSql})""".stripMargin),
      "Keep only epochs whose adapter exists (test_all_models.py:38-44)."),

    // ---------------------------------------------------------------- J3
    QueryDef(
      "equijoin_meta",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = broadcast(Tables.customer(s, d))
        val n = broadcast(Tables.nation(s, d))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            (sum(floor(col("o_totalprice") * 100)) / 100.0).as("total_price"))
      },
      Some("""SELECT n_name, count(*) AS n_orders,
        | sum(floor(o_totalprice * 100)) / 100.0 AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin),
      "Artifacts matched to grid params by composite key = equi-join " +
        "(test_all_models_llm_eval_sophia.py:46-51); dimension tables " +
        "broadcast — no shuffle of the fact side for the join itself."),

    // ---------------------------------------------------------------- J4
    QueryDef(
      "crossjoin_grid",
      (s, d) => Grids.adapters(s)
        .crossJoin(Grids.epochs(s))
        .crossJoin(Grids.tasks(s))
        .select(col("adapter"), col("epoch_str"), col("task"),
          col("num_shot").cast("bigint").as("num_shot"),
          concat_ws("_", col("adapter"), col("epoch_str"), col("task"),
            col("num_shot")).as("run_id")),
      Some(s"""SELECT adapter, epoch_str, task, num_shot::BIGINT AS num_shot,
        | concat_ws('_', adapter, epoch_str, task, num_shot) AS run_id
        |FROM ${Grids.adaptersSql} CROSS JOIN ${Grids.epochsSql}
        |CROSS JOIN ${Grids.tasksSql}""".stripMargin),
      "adapter x epoch x task cartesian experiment space " +
        "(test_all_models_llm_eval_sophia.py:41-47)."),

    // ---------------------------------------------------------------- J6
    QueryDef(
      "chain_lag_prev",
      (s, d) => Grids.epochs(s).select(
        col("epoch_str"),
        coalesce(
          concat(lit("checkpoints/adapter"),
            lag(col("epoch_str"), 1).over(Window.orderBy(col("epoch_x100")))),
          lit("base_model")).as("resume_from")),
      Some("""SELECT epoch_str, coalesce(
        |  'checkpoints/adapter' || lag(epoch_str) OVER (ORDER BY epoch_x100),
        |  'base_model') AS resume_from
        |FROM (SELECT range AS epoch_x100, (range/100.0)::VARCHAR AS epoch_str
        |      FROM range(20, 420, 20)) ep""".stripMargin),
      "Epoch i resumes from epoch i-1's checkpoint " +
        "(create_all_models.py:54-63) — an as-of-previous-row self join " +
        "via lag()."),
  )
}

/** §2.7 set operations (U1–U3). */
object SetQueries {
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- U1
    QueryDef(
      "union_domains",
      (s, d) => {
        val en = docs(s, d).filter(col("lang") === "en")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val de = docs(s, d).filter(col("lang") === "de")
          .select(col("doc_id"), col("n_chars"), col("lang")) // shuffled order
        en.unionByName(de)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      },
      Some("""SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |FROM (SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'
        |      UNION ALL
        |      SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'de')
        |GROUP BY lang""".stripMargin),
      "Same pipeline pooled over domain corpora " +
        "(create_all_models_json_data.py:29-33) — by-name union, robust to " +
        "column order drift between branches."),

    // ---------------------------------------------------------------- U2
    QueryDef(
      "except_pending",
      (s, d) => Grids.grid(s).select(col("run_key"))
        .except(Grids.done(s).select(col("run_key"))),
      Some(s"""SELECT run_key FROM ${Grids.gridSql}
        |EXCEPT SELECT run_key FROM ${Grids.doneSql}""".stripMargin),
      "grid MINUS done = pending work (create_all_models.py:43-47 as a " +
        "set op)."),

    // ---------------------------------------------------------------- U3
    QueryDef(
      "intersect_ready",
      (s, d) => Grids.grid(s).select(col("run_key"))
        .intersect(Grids.done(s).select(col("run_key"))),
      Some(s"""SELECT run_key FROM ${Grids.gridSql}
        |INTERSECT SELECT run_key FROM ${Grids.doneSql}""".stripMargin),
      "done INTERSECT grid = evaluable adapters (test_all_models.py:38-44)."),
  )
}
