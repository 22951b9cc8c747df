package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 14: training-mixture scheduling — IPF
  * raking of the (lang, source) contingency table toward uniform
  * marginals, and a curriculum interleave schedule.  Both are the
  * control-plane counterparts of domain_mixture_rebalance /
  * domain_temperature_sample: the reference sweeps its experiment grid
  * uniformly (train_adapters/create_all_models.py:39-47); a data
  * pipeline sweeps the *data* mixture instead, and raking is the
  * standard way to hit two marginal targets at once.
  */
object Curation20Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------ IPF raking
    QueryDef(
      "ipf_raking",
      (s, d) => {
        val cells = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"))
        val scalars = cells.agg(
          sum(col("n")).as("total"),
          count_distinct(col("lang")).as("nlang"),
          count_distinct(col("source")).as("nsrc"))
        val wl = Window.partitionBy(col("lang"))
        val ws = Window.partitionBy(col("source"))
        def rakeLang(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("wsum", sum(col("n") * col("w")).over(wl))
            .withColumn("w",
              expr("(w * (total div nlang) * 1000000) div wsum"))
            .drop("wsum")
        def rakeSrc(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("wsum", sum(col("n") * col("w")).over(ws))
            .withColumn("w",
              expr("(w * (total div nsrc) * 1000000) div wsum"))
            .drop("wsum")
        val it0 = cells.crossJoin(broadcast(scalars))
          .withColumn("w", lit(1000000L))
        val raked = rakeSrc(rakeLang(rakeSrc(rakeLang(it0))))
        raked.select(col("lang"), col("source"), col("n"),
          col("w").as("w_e6"), (col("n") * col("w")).as("weighted_e6"))
      },
      Some("""WITH cells AS (
        |  SELECT lang, source, count(*)::BIGINT AS n
        |  FROM documents GROUP BY lang, source),
        |sc AS (SELECT sum(n)::BIGINT AS total,
        |              count(DISTINCT lang)::BIGINT AS nlang,
        |              count(DISTINCT source)::BIGINT AS nsrc
        |       FROM cells),
        |it0 AS (SELECT lang, source, n, 1000000::BIGINT AS w, total,
        |               nlang, nsrc FROM cells, sc),
        |it1 AS (SELECT lang, source, n, total, nlang, nsrc,
        |    (w * (total // nlang) * 1000000) //
        |      CAST(sum(n * w) OVER (PARTITION BY lang) AS BIGINT) AS w
        |  FROM it0),
        |it2 AS (SELECT lang, source, n, total, nlang, nsrc,
        |    (w * (total // nsrc) * 1000000) //
        |      CAST(sum(n * w) OVER (PARTITION BY source) AS BIGINT) AS w
        |  FROM it1),
        |it3 AS (SELECT lang, source, n, total, nlang, nsrc,
        |    (w * (total // nlang) * 1000000) //
        |      CAST(sum(n * w) OVER (PARTITION BY lang) AS BIGINT) AS w
        |  FROM it2),
        |it4 AS (SELECT lang, source, n, total, nlang, nsrc,
        |    (w * (total // nsrc) * 1000000) //
        |      CAST(sum(n * w) OVER (PARTITION BY source) AS BIGINT) AS w
        |  FROM it3)
        |SELECT lang, source, n, w::BIGINT AS w_e6,
        |       (n * w)::BIGINT AS weighted_e6
        |FROM it4""".stripMargin),
      "Iterative proportional fitting (raking): two full sweeps of " +
        "row/column scaling push the (lang, source) contingency table " +
        "toward uniform lang and source marginals simultaneously — the " +
        "multi-constraint generalization of domain_mixture_rebalance. " +
        "All scaling is e6 integer floor arithmetic, so the fixpoint " +
        "trajectory is engine-exact. Scale: the iterations run on the " +
        "aggregated contingency table (|langs| x |sources| cells), not " +
        "raw rows — one groupBy shuffle over the corpus, then " +
        "cell-count-sized windows; at 100 TB the cell table still fits " +
        "in one partition, making extra sweeps effectively free."),

    // ---------------------------------------------- curriculum order
    QueryDef(
      "curriculum_order",
      (s, d) => {
        // exact ntile(3) tier arithmetic on the ScalableIndex dense
        // rank — and the per-tier step TOO: the tiers are contiguous
        // idx ranges of the same (n_chars, doc_id) total order, so
        // step = idx - tier_start + 1 is pure arithmetic. No window at
        // all (a per-tier window would funnel corpus/3 rows per task —
        // the enum-window killer one column over).
        val n = Tables.documents(s, d).count()
        val k = 3L
        val q = n / k
        val r = n % k
        val bucket =
          if (q == 0L) "idx + 1"
          else s"if(idx < ${r * (q + 1)}L, idx div ${q + 1}L, " +
            s"$r + (idx - ${r * (q + 1)}L) div ${q}L) + 1"
        val tierStart =
          if (q == 0L) "idx"
          else s"if(tier <= $r, (tier - 1L) * ${q + 1}L, " +
            s"${r * (q + 1)}L + (tier - 1L - $r) * ${q}L)"
        graft.operators.ScalableIndex.withDenseIndex(
            Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
            Seq(col("n_chars"), col("doc_id")), 8, "idx")
          .withColumn("tier", expr(s"cast($bucket AS bigint)"))
          .withColumn("step", expr(s"idx - ($tierStart) + 1L"))
          .withColumn("global_step",
            (col("step") - 1L) * 3L + col("tier"))
          .filter(col("global_step") <= 60)
          .select(col("global_step"), col("doc_id"), col("tier"),
            col("n_chars"))
      },
      Some("""WITH tiers AS (
        |  SELECT doc_id, n_chars,
        |    ntile(3) OVER (ORDER BY n_chars, doc_id)::BIGINT AS tier
        |  FROM documents),
        |steps AS (SELECT doc_id, n_chars, tier,
        |    row_number() OVER (PARTITION BY tier
        |      ORDER BY n_chars, doc_id)::BIGINT AS step
        |  FROM tiers)
        |SELECT (step - 1) * 3 + tier AS global_step, doc_id, tier, n_chars
        |FROM steps WHERE (step - 1) * 3 + tier <= 60""".stripMargin),
      "Curriculum interleave schedule: documents are cut into three " +
        "difficulty tiers by length (deterministic ntile over a total " +
        "order), then emitted round-robin easy/medium/hard so every " +
        "training window sees the full difficulty mix while average " +
        "difficulty stays flat — the schedule LLM data pipelines use " +
        "when pure easy-to-hard ordering destabilizes training. One " +
        "range exchange total: tiers are contiguous ranges of the " +
        "dense index, so both tier and per-tier step are closed-form " +
        "arithmetic on idx — no per-tier window anywhere in the plan."),
  )
}
