package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 33: sequence-model evaluation, multi-touch attribution, ordered
  * t-closeness, and compaction packing — the readouts that sit between
  * the engine's behavioral models (Markov transitions, funnels) and its
  * release gates (k-anonymity, small-file maintenance).
  */
object Curation39Queries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------- Markov top-1 next-event accuracy
    QueryDef(
      "markov_next_event_accuracy",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = Tables.events(s, d)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("src"),
            col("next_type").as("dst"))
          .agg(count(lit(1)).as("n"))
        trans
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("src"))
              .orderBy(col("n").desc, col("dst"))))
          .withColumn("n_total", sum(col("n")).over(
            Window.partitionBy(col("src"))))
          .filter(col("rk") === 1)
          .select(col("src"), col("dst").as("predicted_next"),
            col("n_total"), col("n").as("n_hit"),
            expr("(1000 * n) div n_total").as("acc_permille"))
      },
      Some("""WITH tr AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |cnt AS (SELECT src, dst, count(*)::BIGINT AS n FROM tr
        |        WHERE dst IS NOT NULL GROUP BY 1, 2),
        |rk AS (SELECT src, dst, n,
        |    row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk,
        |    sum(n) OVER (PARTITION BY src)::BIGINT AS n_total
        |  FROM cnt)
        |SELECT src, dst AS predicted_next, n_total, n AS n_hit,
        |  ((1000 * n) // n_total)::BIGINT AS acc_permille
        |FROM rk WHERE rk = 1""".stripMargin),
      "Top-1 accuracy of the Markov next-event predictor: per source " +
        "state, the modal next event (tie-broken lexicographically) and " +
        "the share of observed transitions it gets right — the " +
        "resubstitution readout of event_transition_counts as a MODEL " +
        "EVAL (how predictable is the stream), the number a sequence " +
        "model must beat to justify its cost.  The accuracy is exactly " +
        "max-row-count / row-total, so no join back to the transitions " +
        "is needed: one lead window, one count agg, one 5-row window " +
        "pass.  The transition count table is |types|^2 <= 25 rows " +
        "regardless of corpus size — the readout is scale-free."),

    // --------------------------- U-shaped multi-touch attribution
    QueryDef(
      "position_attribution_credit",
      (s, d) => {
        val ev = Tables.events(s, d)
        val touches = ev
          .filter(col("event_type").isin("click", "view"))
          .select(col("user_id").as("t_uid"),
            col("event_id").as("touch_id"), col("ts").as("t_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"),
            col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        val pairs = touches.join(purchases,
          col("t_uid") === col("p_uid") &&
            (col("t_ts") < col("p_ts") ||
              (col("t_ts") === col("p_ts") &&
                col("touch_id") < col("purchase_id"))))
        pairs
          .withColumn("pos", row_number().over(
            Window.partitionBy(col("purchase_id"))
              .orderBy(col("t_ts"), col("touch_id"))).cast("long"))
          .withColumn("k", count(lit(1)).over(
            Window.partitionBy(col("purchase_id"))))
          .select(col("purchase_id"), col("touch_id"), col("pos"),
            col("k").as("k_touches"),
            when(col("k") === 1, lit(1000L))
              .when(col("k") === 2, lit(500L))
              .when(col("pos") === 1 || col("pos") === col("k"), lit(400L))
              .otherwise(expr("200 div (k - 2)")).cast("long")
              .as("credit_permille"))
      },
      Some("""WITH t AS (SELECT user_id, event_id AS touch_id, ts AS t_ts
        |       FROM events WHERE event_type IN ('click', 'view')),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts
        |      FROM events WHERE event_type = 'purchase'),
        |pairs AS (SELECT p.purchase_id, t.touch_id, t.t_ts
        |  FROM t JOIN p ON t.user_id = p.user_id
        |   AND (t.t_ts < p.p_ts
        |        OR (t.t_ts = p.p_ts AND t.touch_id < p.purchase_id))),
        |pos AS (SELECT purchase_id, touch_id,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY t_ts, touch_id)::BIGINT AS pos,
        |    count(*) OVER (PARTITION BY purchase_id)::BIGINT AS k
        |  FROM pairs)
        |SELECT purchase_id, touch_id, pos, k AS k_touches,
        |  (CASE WHEN k = 1 THEN 1000 WHEN k = 2 THEN 500
        |        WHEN pos = 1 OR pos = k THEN 400
        |        ELSE 200 // (k - 2) END)::BIGINT AS credit_permille
        |FROM pos""".stripMargin),
      "U-shaped (position-based) multi-touch attribution: every " +
        "preceding click/view of the purchasing user earns credit — " +
        "40% to the first touch, 40% to the last, the middle 20% split " +
        "evenly (truncated permille; 100% / 50-50 for 1- and 2-touch " +
        "paths) — the standard refinement of first_touch_attribution " +
        "when no single touch deserves the whole conversion.  The " +
        "touch x purchase pairing is an EQUI-join on user_id with an " +
        "ordering filter (never a cross product), so it shuffles once " +
        "on user_id and the per-purchase windows ride the same " +
        "partitioning; per-user path lengths bound the pair fan-out."),

    // ------------------------------- ordered t-closeness audit
    QueryDef(
      "t_closeness_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("lang"), col("source"),
            least(lit(9L), expr("n_chars div 64")).as("bin"))
        val classBin = docs.groupBy(col("lang"), col("source"), col("bin"))
          .agg(count(lit(1)).as("nc"))
        val spine = docs.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_class"))
          .select(col("lang"), col("source"), col("n_class"),
            explode(sequence(lit(0L), lit(9L))).as("bin"))
        val globalBin = docs.groupBy(col("bin"))
          .agg(count(lit(1)).as("ng"))
        val globalN = docs.agg(count(lit(1)).as("n_global"))
        val wc = Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("bin"))
        spine
          .join(classBin, Seq("lang", "source", "bin"), "left")
          .join(broadcast(globalBin), Seq("bin"), "left")
          .na.fill(0L, Seq("nc", "ng"))
          .crossJoin(broadcast(globalN))
          .withColumn("cum_c", sum(col("nc")).over(wc))
          .withColumn("cum_g", sum(col("ng")).over(wc))
          .withColumn("term",
            abs(col("cum_c") * col("n_global") -
              col("cum_g") * col("n_class")))
          .groupBy(col("lang"), col("source"), col("n_class"),
            col("n_global"))
          .agg(sum(col("term")).as("emd_num"))
          .select(col("lang"), col("source"), col("n_class"),
            expr("(1000 * emd_num) div (9 * n_class * n_global)")
              .as("emd_permille"))
          .withColumn("violates_t150", col("emd_permille") >= 150)
      },
      Some("""WITH b AS (SELECT lang, source,
        |    least(9, n_chars // 64)::BIGINT AS bin FROM documents),
        |cb AS (SELECT lang, source, bin, count(*)::BIGINT AS nc
        |       FROM b GROUP BY 1, 2, 3),
        |cls AS (SELECT lang, source, count(*)::BIGINT AS n_class
        |        FROM b GROUP BY 1, 2),
        |spine AS (SELECT lang, source, n_class, i.bin FROM cls,
        |          (SELECT range::BIGINT AS bin FROM range(0, 10)) i),
        |gb AS (SELECT bin, count(*)::BIGINT AS ng FROM b GROUP BY 1),
        |g AS (SELECT count(*)::BIGINT AS n_global FROM b),
        |filled AS (SELECT s.lang, s.source, s.n_class, s.bin,
        |    coalesce(cb.nc, 0)::BIGINT AS nc,
        |    coalesce(gb.ng, 0)::BIGINT AS ng
        |  FROM spine s
        |  LEFT JOIN cb ON s.lang = cb.lang AND s.source = cb.source
        |              AND s.bin = cb.bin
        |  LEFT JOIN gb ON s.bin = gb.bin),
        |cum AS (SELECT lang, source, n_class, n_global, bin,
        |    sum(nc) OVER w::BIGINT AS cum_c,
        |    sum(ng) OVER w::BIGINT AS cum_g
        |  FROM filled, g
        |  WINDOW w AS (PARTITION BY lang, source ORDER BY bin))
        |SELECT lang, source, n_class,
        |  ((1000 * sum(abs(cum_c * n_global - cum_g * n_class)))
        |   // (9 * n_class * n_global))::BIGINT AS emd_permille,
        |  (((1000 * sum(abs(cum_c * n_global - cum_g * n_class)))
        |    // (9 * n_class * n_global)) >= 150) AS violates_t150
        |FROM cum GROUP BY lang, source, n_class, n_global""".stripMargin),
      "t-closeness over the ordered sensitive attribute (10 fixed " +
        "length bins): per quasi-identifier class (lang, source), the " +
        "earth-mover's distance between the class's length distribution " +
        "and the global one — EMD over ordered bins is the mean " +
        "|CDF difference|, computed here CROSS-MULTIPLIED (cum_c*Ng vs " +
        "cum_g*Nc) so the audit is exact integer arithmetic end to " +
        "end.  Complements k_anonymity_violations / l_diversity_audit: " +
        "k-anonymity bounds class SIZE, l-diversity bounds value " +
        "variety, t-closeness bounds how much a class's value " +
        "DISTRIBUTION leaks vs the corpus.  The 10-bin spine comes from " +
        "a generator (no join), the global histogram is a broadcast 10 " +
        "rows, and classes are one hash agg — a single shuffle on the " +
        "class key at any corpus size."),

    // ------------------------------- compaction packing plan
    QueryDef(
      "compaction_packing_plan",
      (s, d) => {
        val target = 4096L
        // exclusive per-source running offset via ScalableGroups: one
        // range exchange on (source, doc_id) + a broadcast per-source
        // offset — a source-partitioned window would put corpus/|source|
        // rows on single tasks; the range partitioning splits every
        // source across tasks
        val base = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
        graft.operators.ScalableGroups.withGroupRunningSums(
            base, Seq("source"), Seq(col("doc_id")), Seq("n_chars"), 8,
            exclusive = true, prefix = "off_")
          .withColumn("bin_id", expr(s"off_n_chars div $target"))
          .groupBy(col("source"), col("bin_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("bytes"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .withColumn("fill_permille",
            expr(s"(1000 * bytes) div $target"))
      },
      Some("""WITH off AS (SELECT source, doc_id, n_chars,
        |    coalesce(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0)::BIGINT AS start_off
        |  FROM documents)
        |SELECT source, (start_off // 4096)::BIGINT AS bin_id,
        |  count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS bytes,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |  ((1000 * sum(n_chars)) // 4096)::BIGINT AS fill_permille
        |FROM off GROUP BY 1, 2""".stripMargin),
      "Small-file compaction PLAN: pack each source's documents (in " +
        "doc_id arrival order) into target-size output files by " +
        "running-offset binning — bin = floor(exclusive-prefix-bytes / " +
        "4096) — the next-fit packing that preserves arrival locality " +
        "and never reorders data, with per-bin doc ranges so each " +
        "output file is a contiguous id span (resumable, and range " +
        "metadata stays sorted for zone-map skipping).  One window " +
        "pass + one agg, both on the same source partitioning: the " +
        "planning cost is a single shuffle however many billions of " +
        "small files need compacting.  The executed twin of this plan " +
        "(coalesce rewrite, content-equal) is SinkSpec's maintenance " +
        "pass."),
  )
}
