package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 31: experimentation analysis — sample-ratio-mismatch detection
  * on the deterministic split, difference-in-differences on the event
  * log, and power/MDE planning from the corpus's own baseline rate.
  * The experiment-readout shapes next to cuped_adjustment and
  * two_proportion_ztest; all integer except the one documented IEEE
  * sqrt.
  */
object Curation37Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------- sample-ratio mismatch
    QueryDef(
      "srm_check",
      (s, d) => {
        // the engine's own 80/10/10 doc split (split_train_val_test's
        // hash) audited for sample-ratio mismatch
        val bucket = pmod(conv(substring(md5(concat(lit("split"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"),
          lit(10L))
        val assigned = Tables.documents(s, d)
          .select(when(bucket < 8, "train")
            .when(bucket === 8, "val").otherwise("test").as("split"))
          .groupBy(col("split")).agg(count(lit(1)).as("n_obs"))
        val tot = assigned.agg(sum(col("n_obs")).as("n"))
        assigned.crossJoin(broadcast(tot))
          .withColumn("exp_pm",
            when(col("split") === "train", 800L).otherwise(100L))
          .select(col("split"), col("n_obs"),
            (col("n") * col("exp_pm")).as("expected_x1000"),
            expr("""((1000 * n_obs - n * exp_pm)
              | * (1000 * n_obs - n * exp_pm)) div (n * exp_pm)"""
              .stripMargin).as("chi2_contrib_e3"))
      },
      Some("""WITH b AS (SELECT
        |    CASE WHEN (('0x' || substr(md5('split' || doc_id::VARCHAR),
        |           1, 8))::BIGINT % 10) < 8 THEN 'train'
        |         WHEN (('0x' || substr(md5('split' || doc_id::VARCHAR),
        |           1, 8))::BIGINT % 10) = 8 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |a AS (SELECT split, count(*)::BIGINT AS n_obs FROM b GROUP BY 1),
        |t AS (SELECT sum(n_obs)::BIGINT AS n FROM a)
        |SELECT split, n_obs,
        |  (n * CASE WHEN split = 'train' THEN 800 ELSE 100 END)::BIGINT
        |    AS expected_x1000,
        |  (((1000 * n_obs - n * CASE WHEN split = 'train' THEN 800
        |       ELSE 100 END)
        |    * (1000 * n_obs - n * CASE WHEN split = 'train' THEN 800
        |       ELSE 100 END))
        |   // (n * CASE WHEN split = 'train' THEN 800 ELSE 100 END))
        |    ::BIGINT AS chi2_contrib_e3
        |FROM a, t""".stripMargin),
      "Sample-ratio-mismatch check on the engine's own 80/10/10 hash " +
        "split: per-cell chi-square contributions in e3 fixed point " +
        "(cross-multiplied, zero float).  SRM is the first thing to " +
        "test about ANY assignment mechanism — a biased hash or a " +
        "dropped shard shows up here before it silently biases every " +
        "downstream eval; total contrib > ~7.8e3 (chi2_0.98, 2 dof) " +
        "means the split is broken, not unlucky."),

    // ----------------------------------------- difference-in-differences
    QueryDef(
      "diff_in_diff_purchases",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val span = ev.agg(min(col("us")).as("t0"))
        val cells = ev.crossJoin(broadcast(span))
          .select(pmod(col("user_id"), lit(2L)).as("grp"),
            when(expr("(us - t0) div 86400000000") < 15, 0L).otherwise(1L)
              .as("period"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("purch"))
          .groupBy(col("grp"), col("period"))
          .agg(sum(col("purch")).as("purchases"))
        val users = ev.select(pmod(col("user_id"), lit(2L)).as("grp"),
          col("user_id")).distinct()
          .groupBy(col("grp")).agg(count(lit(1)).as("n_users"))
        val wide = cells.join(users, Seq("grp"))
          .select(col("grp"), col("period"),
            expr("(1000 * purchases) div n_users").as("mean_e3"),
            col("n_users"))
        val p = wide.groupBy(col("grp"))
          .agg(max(col("n_users")).as("n_users"),
            sum(when(col("period") === 0, col("mean_e3")).otherwise(0L))
              .as("pre_e3"),
            sum(when(col("period") === 1, col("mean_e3")).otherwise(0L))
              .as("post_e3"))
        val a = p.filter(col("grp") === 0)
          .select(col("n_users").as("n_control"),
            col("pre_e3").as("control_pre_e3"),
            col("post_e3").as("control_post_e3"))
        val b = p.filter(col("grp") === 1)
          .select(col("n_users").as("n_treat"),
            col("pre_e3").as("treat_pre_e3"),
            col("post_e3").as("treat_post_e3"))
        a.crossJoin(broadcast(b))
          .withColumn("did_e3",
            (col("treat_post_e3") - col("treat_pre_e3")) -
              (col("control_post_e3") - col("control_pre_e3")))
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(ts::TIMESTAMP) AS us FROM events),
        |t0 AS (SELECT min(us) AS t0 FROM ev),
        |cells AS (SELECT (user_id % 2)::BIGINT AS grp,
        |    CASE WHEN (us - t0) // 86400000000 < 15 THEN 0 ELSE 1
        |      END::BIGINT AS period,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |        END)::BIGINT AS purchases
        |  FROM ev, t0 GROUP BY 1, 2),
        |users AS (SELECT (user_id % 2)::BIGINT AS grp,
        |    count(DISTINCT user_id)::BIGINT AS n_users
        |  FROM ev GROUP BY 1),
        |wide AS (SELECT c.grp, c.period,
        |    ((1000 * c.purchases) // u.n_users)::BIGINT AS mean_e3,
        |    u.n_users
        |  FROM cells c JOIN users u ON u.grp = c.grp),
        |p AS (SELECT grp, max(n_users)::BIGINT AS n_users,
        |    sum(CASE WHEN period = 0 THEN mean_e3 ELSE 0 END)::BIGINT
        |      AS pre_e3,
        |    sum(CASE WHEN period = 1 THEN mean_e3 ELSE 0 END)::BIGINT
        |      AS post_e3
        |  FROM wide GROUP BY grp)
        |SELECT a.n_users AS n_control, a.pre_e3 AS control_pre_e3,
        |  a.post_e3 AS control_post_e3,
        |  b.n_users AS n_treat, b.pre_e3 AS treat_pre_e3,
        |  b.post_e3 AS treat_post_e3,
        |  ((b.post_e3 - b.pre_e3) - (a.post_e3 - a.pre_e3))::BIGINT
        |    AS did_e3
        |FROM p a, p b WHERE a.grp = 0 AND b.grp = 1""".stripMargin),
      "Difference-in-differences readout: user-parity pseudo-arms, " +
        "pre/post periods split at day 15, per-user purchase means in " +
        "e3 — the causal-inference shape that nets out both the " +
        "between-group level difference and the common time trend.  On " +
        "hash-assigned arms the true effect is zero, so did_e3 near " +
        "zero doubles as an A/A validation of the whole readout " +
        "path.  2x2 cell state; one scan."),

    // ------------------------------------------------- power / MDE
    QueryDef(
      "ab_power_mde",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("converted"))
        val base = users.agg(count(lit(1)).as("n_users"),
          sum(col("converted")).as("n_converted"))
          .select(col("n_users"), col("n_converted"),
            expr("(1000000 * n_converted) div n_users").as("p_e6"))
        val horizons = s.range(3)
          .select((pow(lit(2.0), col("id").cast("double"))).cast("long")
            .as("mult"))
        base.crossJoin(broadcast(horizons))
          .select(col("mult").as("n_multiple"),
            (col("n_users") * col("mult")).as("n_total"),
            expr("(n_users * mult) div 2").as("n_per_arm"),
            col("p_e6"),
            // mde = 2.80 * sqrt(2 p (1-p) / n_arm): the only float op
            // is the correctly-rounded sqrt + two multiplies
            floor(lit(2800.0) *
              sqrt((lit(2.0) * col("p_e6").cast("double") *
                (lit(1000000L) - col("p_e6")).cast("double")) /
                (expr("(n_users * mult) div 2").cast("double") * 1e12))
              * lit(1000.0)).cast("long").as("mde_e6"))
      },
      Some("""WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |        END)::BIGINT AS converted
        |  FROM events GROUP BY user_id),
        |base AS (SELECT count(*)::BIGINT AS n_users,
        |    sum(converted)::BIGINT AS n_converted,
        |    ((1000000 * sum(converted)) // count(*))::BIGINT AS p_e6
        |  FROM u),
        |h AS (SELECT (2 ** range)::BIGINT AS mult FROM range(0, 3))
        |SELECT mult AS n_multiple,
        |  (n_users * mult)::BIGINT AS n_total,
        |  ((n_users * mult) // 2)::BIGINT AS n_per_arm,
        |  p_e6,
        |  floor(2800.0 * sqrt((2.0 * p_e6::DOUBLE
        |      * (1000000 - p_e6)::DOUBLE)
        |    / (((n_users * mult) // 2)::DOUBLE * 1e12)) * 1000.0)
        |    ::BIGINT AS mde_e6
        |FROM base, h""".stripMargin),
      "A/B power planning from the corpus's own baseline: conversion " +
        "rate p from the event log, then the minimum detectable effect " +
        "at 80% power / 5% alpha (z_a + z_b = 2.80, literal constant) " +
        "for 1x/2x/4x the current population.  mde halves per 4x " +
        "sample — the sqrt law made concrete with this data's actual " +
        "p.  Exact integers except the correctly-rounded IEEE sqrt " +
        "(both engines bit-agree, same as domain_temperature_sample)."),
  )
}
