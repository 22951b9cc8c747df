package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 5: experiment analytics and SFT data
  * preparation.
  *
  *  - CUPED variance-reduced A/B comparison (Deng et al. 2013) —
  *    pre-period covariate adjustment from exact integer moments;
  *  - loss-mask span computation for SFT training records (the
  *    prompt/completion token boundary the trainer masks,
  *    train_adapters/RAG-eval-create_model.py:133-152);
  *  - chat-format validation gate (role ordering / alternation) over
  *    per-user event transcripts.
  */
object Curation11Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ CUPED
    QueryDef(
      "cuped_adjustment",
      (s, d) => {
        val e = Tables.events(s, d)
        val mid = e.agg(
          expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")
            .as("mid"))
        val per = e.crossJoin(broadcast(mid))
          .groupBy(col("user_id"))
          .agg(
            count(when(expr("unix_micros(ts) < mid"), 1)).as("x"),
            count(when(expr("unix_micros(ts) >= mid") &&
              col("event_type") === "purchase", 1)).as("y"))
          .withColumn("variant", pmod(col("user_id"), lit(2)))
        val g = per.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        per.groupBy(col("variant"))
          .agg(count(lit(1)).as("nv"),
            sum(col("x")).as("sxv"), sum(col("y")).as("syv"))
          .crossJoin(broadcast(g))
          .select(col("variant"), col("nv"),
            (col("syv").cast("double") / col("nv").cast("double"))
              .as("mean_y"), {
              val theta =
                (col("n") * col("sxy") - col("sx") * col("sy"))
                  .cast("double") /
                  (col("n") * col("sxx") - col("sx") * col("sx"))
                    .cast("double")
              (col("syv").cast("double") / col("nv").cast("double") -
                theta * (col("sxv").cast("double") /
                  col("nv").cast("double") -
                  col("sx").cast("double") / col("n").cast("double")))
                .as("adj_mean_y")
            })
      },
      Some("""WITH mid AS (
        |  SELECT (min(epoch_us(ts::TIMESTAMP))
        |          + max(epoch_us(ts::TIMESTAMP))) // 2 AS mid
        |  FROM events),
        |per AS (SELECT user_id, user_id % 2 AS variant,
        |    count(CASE WHEN epoch_us(ts::TIMESTAMP) < mid
        |               THEN 1 END)::BIGINT AS x,
        |    count(CASE WHEN epoch_us(ts::TIMESTAMP) >= mid
        |                AND event_type = 'purchase'
        |               THEN 1 END)::BIGINT AS y
        |  FROM events, mid GROUP BY user_id),
        |g AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |        sum(y)::BIGINT AS sy, sum(x*x)::BIGINT AS sxx,
        |        sum(x*y)::BIGINT AS sxy
        |      FROM per),
        |v AS (SELECT variant, count(*)::BIGINT AS nv,
        |        sum(x)::BIGINT AS sxv, sum(y)::BIGINT AS syv
        |      FROM per GROUP BY variant)
        |SELECT variant, nv,
        |  (syv::DOUBLE / nv::DOUBLE) AS mean_y,
        |  (syv::DOUBLE / nv::DOUBLE
        |   - ((n*sxy - sx*sy)::BIGINT::DOUBLE
        |      / (n*sxx - sx*sx)::BIGINT::DOUBLE)
        |     * (sxv::DOUBLE / nv::DOUBLE - sx::DOUBLE / n::DOUBLE))
        |    AS adj_mean_y
        |FROM v, g""".stripMargin),
      "CUPED variance reduction (Deng et al. 2013): post-period " +
        "purchase count adjusted by the pre-period activity covariate, " +
        "theta = cov(X,Y)/var(X) pooled across variants — all moments " +
        "exact integers, one fixed IEEE tail mirrored op-for-op (the " +
        "pearson_corr_lang convention). The pre/post boundary is the " +
        "data-derived timestamp midpoint, integer micros. Two shuffles " +
        "total (user agg, 2-row variant agg); the experiment readout " +
        "every A/B platform runs at 100 TB event scale."),

    // ------------------------------------------------ loss-mask spans
    QueryDef(
      "loss_mask_spans",
      (s, d) => {
        val prompt = concat(
          lit("### Instruction: \nUse the provided input to create a narrative.\n"),
          lit("### Input: \n"), col("text"), lit("\n"),
          lit("### Response :\n"))
        Tables.documents(s, d).select(
          col("doc_id"),
          size(split(prompt, " ")).cast("bigint").as("prompt_tokens"),
          size(split(col("text"), " ")).cast("bigint")
            .as("completion_tokens"))
          .select(col("doc_id"), col("prompt_tokens"),
            col("completion_tokens"),
            (col("prompt_tokens") + 1).as("mask_start"))
      },
      Some("""SELECT doc_id,
        | len(string_split(concat('### Instruction: ', chr(10),
        |   'Use the provided input to create a narrative.', chr(10),
        |   '### Input: ', chr(10), text, chr(10),
        |   '### Response :', chr(10)), ' '))::BIGINT AS prompt_tokens,
        | len(string_split(text, ' '))::BIGINT AS completion_tokens,
        | len(string_split(concat('### Instruction: ', chr(10),
        |   'Use the provided input to create a narrative.', chr(10),
        |   '### Input: ', chr(10), text, chr(10),
        |   '### Response :', chr(10)), ' '))::BIGINT + 1 AS mask_start
        |FROM documents""".stripMargin),
      "SFT loss-mask boundary per training record: token offsets of the " +
        "completion region under the reference's own prompt template " +
        "(RAG-eval-create_model.py:120-131 formats instruction/input/" +
        "response; the trainer masks loss before the response span, " +
        ":133-152). Whitespace-token offsets; under GraftExtensions the " +
        "size(split) forms compile to the array-free token_count " +
        "kernel via RewriteTokenCount — same result, no allocation."),

    // ------------------------------------------------ chat format gate
    QueryDef(
      "chat_format_validate",
      (s, d) => {
        val role = when(col("event_type") === "signup", "system")
          .when(col("event_type").isin("click", "purchase"), "user")
          .otherwise("assistant")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            role.as("role"))
          .withColumn("prev", lag(col("role"), 1).over(w))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_msgs"),
            count(when(col("role") === col("prev"), 1)).as("n_repeats"),
            max(when(col("rn") === 1, col("role") =!= "assistant"))
              .as("starts_ok"))
      },
      Some("""WITH msgs AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'signup' THEN 'system'
        |         WHEN event_type IN ('click', 'purchase') THEN 'user'
        |         ELSE 'assistant' END AS role
        |  FROM events),
        |seq AS (SELECT user_id, role,
        |    lag(role) OVER (PARTITION BY user_id
        |                    ORDER BY ts, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM msgs)
        |SELECT user_id, count(*)::BIGINT AS n_msgs,
        |  count(CASE WHEN role = prev THEN 1 END)::BIGINT AS n_repeats,
        |  max(CASE WHEN rn = 1 THEN role <> 'assistant' END) AS starts_ok
        |FROM seq GROUP BY user_id""".stripMargin),
      "Chat-template structure gate over per-user event transcripts " +
        "(role mapping stands in for parsed conversation JSON): counts " +
        "consecutive same-role messages (alternation violations) and " +
        "checks the opening role — the format validation an SFT " +
        "pipeline runs before tokenization, where a malformed " +
        "conversation corrupts the loss mask silently. One window + agg " +
        "on the same user_id partitioning: a single shuffle."),
  )
}
