package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 16: snapshot maintenance — CDC merge
  * classification between two state snapshots, and purged time-series
  * cross-validation splits.  The reference's run-state model is
  * "filesystem as snapshot" with skip-if-done diffs
  * (train_adapters/create_all_models.py:43-47); merge classification is
  * that diff made explicit, and the purged split is the leakage-safe
  * version of its epoch-grid train/eval partitioning.
  */
object Curation22Queries {

  /** Latest (event_type, value_e3) per user within [lo, hi) days of
    * January 2024 — the per-window state snapshot. */
  private def snapshot(s: org.apache.spark.sql.SparkSession, d: String,
      lo: Int, hi: Int) = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .filter(dayofmonth(col("ts")) >= lo && dayofmonth(col("ts")) < hi)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        floor(col("value") * 1000).cast("long").as("value_e3"))
  }

  private def snapshotSql(lo: Int, hi: Int, name: String) =
    s"""$name AS (
       |  SELECT user_id, event_type,
       |         CAST(floor(value * 1000) AS BIGINT) AS value_e3
       |  FROM (SELECT user_id, event_type, value, row_number() OVER (
       |          PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
       |          AS rn
       |        FROM events
       |        WHERE date_part('day', ts) >= $lo
       |          AND date_part('day', ts) < $hi)
       |  WHERE rn = 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------- CDC merge classify
    QueryDef(
      "merge_upsert_classify",
      (s, d) => {
        val base = snapshot(s, d, 1, 16)
          .withColumnRenamed("event_type", "b_type")
          .withColumnRenamed("value_e3", "b_value")
        val next = snapshot(s, d, 16, 31)
          .withColumnRenamed("event_type", "n_type")
          .withColumnRenamed("value_e3", "n_value")
        base.join(next, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            when(col("b_type").isNull, lit("insert"))
              .when(col("n_type").isNull, lit("delete"))
              .when(col("b_type") === col("n_type") &&
                col("b_value") === col("n_value"), lit("unchanged"))
              .otherwise(lit("update")).as("action"))
      },
      Some(s"""WITH ${snapshotSql(1, 16, "base")},
        |${snapshotSql(16, 31, "next")}
        |SELECT coalesce(b.user_id, n.user_id) AS user_id,
        |  CASE WHEN b.user_id IS NULL THEN 'insert'
        |       WHEN n.user_id IS NULL THEN 'delete'
        |       WHEN b.event_type = n.event_type
        |            AND b.value_e3 = n.value_e3 THEN 'unchanged'
        |       ELSE 'update' END AS action
        |FROM base b FULL OUTER JOIN next n ON b.user_id = n.user_id""".stripMargin),
      "CDC merge classification: the latest per-user state in two " +
        "month-halves, full-outer joined on the key and classified " +
        "insert/update/delete/unchanged — MERGE INTO's matched/not-" +
        "matched branches as an auditable table, and the explicit form " +
        "of the reference's skip-if-done filesystem diff. Both " +
        "snapshots shuffle by user_id, so the outer join is " +
        "co-partitioned with zero extra exchange; at 100 TB both " +
        "sides bucket by key and the diff is shuffle-free."),

    // -------------------------------------------- purged time split
    QueryDef(
      "purged_time_split",
      (s, d) => {
        import s.implicits._
        val folds = Seq((1L, 1, 11), (2L, 11, 21), (3L, 21, 31))
          .toDF("fold", "lo", "hi")
        val days = Tables.events(s, d)
          .select(dayofmonth(col("ts")).as("day"))
        days.crossJoin(broadcast(folds))
          .withColumn("role",
            when(col("day") >= col("lo") && col("day") < col("hi"),
              lit("test"))
              .when(col("day") === col("lo") - 1 || col("day") === col("hi"),
                lit("embargo"))
              .otherwise(lit("train")))
          .groupBy(col("fold"))
          .agg(
            sum(when(col("role") === "test", 1L).otherwise(0L))
              .as("n_test"),
            sum(when(col("role") === "train", 1L).otherwise(0L))
              .as("n_train"),
            sum(when(col("role") === "embargo", 1L).otherwise(0L))
              .as("n_embargo"))
      },
      Some("""WITH folds AS (
        |  SELECT * FROM (VALUES (1, 1, 11), (2, 11, 21), (3, 21, 31))
        |    v(fold, lo, hi)),
        |days AS (SELECT date_part('day', ts) AS day FROM events),
        |roles AS (SELECT fold,
        |    CASE WHEN day >= lo AND day < hi THEN 'test'
        |         WHEN day = lo - 1 OR day = hi THEN 'embargo'
        |         ELSE 'train' END AS role
        |  FROM days CROSS JOIN folds)
        |SELECT fold::BIGINT AS fold,
        |  sum(CASE WHEN role = 'test' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_test,
        |  sum(CASE WHEN role = 'train' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_train,
        |  sum(CASE WHEN role = 'embargo' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_embargo
        |FROM roles GROUP BY fold""".stripMargin),
      "Purged k-fold time-series split: three contiguous 10-day test " +
        "windows, each with a 1-day embargo on both sides excluded " +
        "from training so serial correlation cannot leak across the " +
        "boundary (the time-series analog of split_leakage_check). " +
        "The fold table is a 3-row broadcast against a single-column " +
        "day projection — one narrow pass over the event stream and " +
        "one 3-group aggregate, so fold accounting costs one scan at " +
        "any scale."),
  )
}
