package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 35: the multi-dimension TPC-H Q5 join shape, the IVF-PQ
  * asymmetric-distance search path, a Mann-Kendall monotone-trend test,
  * and the language-ID confusion matrix — closing the loop from
  * operators (joins, PQ codes, daily counts, classifiers) to the
  * readouts that judge them.
  */
object Curation41Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------- Q5 shape
    QueryDef(
      "tpch_q5_local_supplier",
      (s, d) => {
        val rev = (floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("rev_e4")
        val rgn = Tables.region(s, d)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
        val nat = Tables.nation(s, d)
          .join(broadcast(rgn), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), rev)
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev_e4")).as("revenue_e4"))
      },
      Some("""SELECT n_name,
        |  sum((floor(l_extendedprice * 100)::BIGINT)
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT
        |    AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |              AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin),
      "TPC-H Q5 local-supplier revenue: six-table star with the " +
        "customer-nation = supplier-nation locality condition, region " +
        "filter folded into the nation -> supplier broadcast chain, " +
        "order-date range pushed to the orders scan, revenue in exact " +
        "e4 fixed point.  Join order is deliberate: the ONLY shuffle " +
        "is lineitem x filtered-orders on orderkey; customer and the " +
        "region-pruned supplier/nation chain broadcast, and the " +
        "locality predicate rides the supplier broadcast instead of a " +
        "second fact shuffle — at 100 TB the plan cost is one pass " +
        "over lineitem, which is the Q5 ideal."),

    // -------------------------------------- PQ asymmetric-distance
    QueryDef(
      "pq_adc_topk",
      (s, d) => {
        import Vector2Queries.{quant, sqDist}
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), quant(col("embedding")).as("qe"))
        val sub = q
          .select(col("vec_id"), explode(sequence(lit(0), lit(3))).as("m"),
            col("qe"))
          .select(col("vec_id"), col("m"),
            expr("slice(qe, m * 16 + 1, 16)").as("sv"))
        val cb = sub.filter(col("vec_id") < 8)
          .select(col("m"), col("vec_id").as("cid"), col("sv").as("csub"))
        // database codes: same construction as pq_encode (min struct =
        // nearest centroid, ties to lowest cid)
        val codes = sub.join(broadcast(cb), "m")
          .select(col("vec_id"), col("m"),
            struct(sqDist(col("sv"), col("csub")).as("dist"),
              col("cid")).as("dc"))
          .groupBy(col("vec_id"), col("m"))
          .agg(min(col("dc")).as("mm"))
          .select(col("vec_id"), col("m"), col("mm.cid").as("code"))
        // per-query distance tables: 5 queries x 4 subspaces x 8 cells
        val dt = sub.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("m").as("dm"),
            col("sv").as("qsv"))
          .join(broadcast(cb), col("dm") === col("m"))
          .select(col("qid"), col("dm"), col("cid"),
            sqDist(col("qsv"), col("csub")).as("dist"))
        codes.join(broadcast(dt),
            codes("m") === dt("dm") && codes("code") === dt("cid"))
          .groupBy(col("qid"), col("vec_id"))
          .agg(sum(col("dist")).as("adc_dist"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("adc_dist"), col("vec_id"))).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("vec_id"), col("rk"), col("adc_dist"))
      },
      Some(s"""WITH q AS (SELECT vec_id,
        |    ${Vector2Queries.quantSql.format("embedding")} AS qe
        |  FROM embeddings),
        |sub AS (SELECT vec_id, m.m AS m,
        |    qe[m.m * 16 + 1 : m.m * 16 + 16] AS sv
        |  FROM q, (SELECT range AS m FROM range(0, 4)) m),
        |cb AS (SELECT m, vec_id AS cid, sv AS csub FROM sub
        |       WHERE vec_id < 8),
        |codes AS (SELECT vec_id, m, cid AS code FROM (
        |    SELECT s.vec_id, s.m, c.cid,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY ${Vector2Queries.sqDistSql("s.sv", "c.csub")},
        |                 c.cid) AS rn
        |    FROM sub s JOIN cb c ON s.m = c.m) WHERE rn = 1),
        |dt AS (SELECT s.vec_id AS qid, s.m AS dm, c.cid,
        |    ${Vector2Queries.sqDistSql("s.sv", "c.csub")} AS dist
        |  FROM sub s JOIN cb c ON s.m = c.m WHERE s.vec_id < 5),
        |adc AS (SELECT dt.qid, codes.vec_id,
        |    sum(dt.dist)::BIGINT AS adc_dist
        |  FROM codes JOIN dt ON dt.dm = codes.m AND dt.cid = codes.code
        |  GROUP BY 1, 2)
        |SELECT qid, vec_id, rk, adc_dist FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |    ORDER BY adc_dist, vec_id)::BIGINT AS rk FROM adc)
        |WHERE rk <= 5""".stripMargin),
      "PQ asymmetric-distance (ADC) top-k search — the query path that " +
        "pq_encode's codes exist for: each query precomputes a 4x8 " +
        "distance table to the subspace codebooks (exact integer " +
        "squared L2 on the e6 grid), then every database vector is " +
        "scored by FOUR table lookups + adds instead of a 64-dim " +
        "distance — the IVF-PQ scan kernel (Jegou et al., TPAMI 2011). " +
        "The distance tables are queries x 32 cells and ALWAYS " +
        "broadcast; codes never leave their partitions, so the search " +
        "cost at 100 TB is one pass over 4-byte-ish codes, not over " +
        "raw vectors.  Top-5 per query with deterministic id " +
        "tie-break."),

    // --------------------------------------- Mann-Kendall trend test
    QueryDef(
      "mann_kendall_trend",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            date_trunc("DAY", col("ts")).as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("c"))
        val nd = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"))
        val pairs = daily.as("x").join(daily.as("y"),
            col("x.event_type") === col("y.event_type") &&
              col("x.day") < col("y.day"))
          .groupBy(col("x.event_type").as("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(signum(col("y.c") - col("x.c")).cast("long")).as("s_stat"))
        pairs.join(nd, Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("n_pairs"),
            col("s_stat"),
            when(col("s_stat") > 0, lit("increasing"))
              .when(col("s_stat") < 0, lit("decreasing"))
              .otherwise(lit("flat")).as("trend"))
      },
      Some("""WITH daily AS (SELECT event_type,
        |    date_trunc('day', ts) AS day, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT event_type, count(*)::BIGINT AS n_days
        |       FROM daily GROUP BY 1),
        |pr AS (SELECT x.event_type, count(*)::BIGINT AS n_pairs,
        |    sum(sign(y.c - x.c))::BIGINT AS s_stat
        |  FROM daily x JOIN daily y ON x.event_type = y.event_type
        |   AND x.day < y.day
        |  GROUP BY 1)
        |SELECT pr.event_type, n_days, n_pairs, s_stat,
        |  (CASE WHEN s_stat > 0 THEN 'increasing'
        |        WHEN s_stat < 0 THEN 'decreasing'
        |        ELSE 'flat' END) AS trend
        |FROM pr JOIN nd ON pr.event_type = nd.event_type""".stripMargin),
      "Mann-Kendall monotone-trend test per event type: S = sum of " +
        "sign(c_j - c_i) over all ordered day pairs of the daily-count " +
        "series — the nonparametric trend detector that needs no " +
        "distribution assumption and is exact integer arithmetic end " +
        "to end (the companion slope estimate is theil_sen_slope).  " +
        "The pair join is per-type over ~30 daily aggregates, so its " +
        "cost is O(types * days^2) on TINY aggregated data — the " +
        "full-resolution events are reduced first, which is what makes " +
        "the quadratic affordable at any corpus size."),

    // --------------------------------- language-ID confusion matrix
    QueryDef(
      "langid_confusion_matrix",
      (s, d) => {
        import s.implicits._
        val lex = TextQueries.lexicon.toDF("cand", "marker")
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val best = toks.join(broadcast(lex), col("tok") === col("marker"))
          .groupBy(col("doc_id"), col("cand"))
          .agg(count(lit(1)).as("hits"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("hits").desc, col("cand"))))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("cand").as("pred_lang"))
        Tables.documents(s, d).select(col("doc_id"), col("lang"))
          .join(best, Seq("doc_id"), "left")
          .groupBy(col("lang"),
            coalesce(col("pred_lang"), lit("und")).as("pred_lang"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some(s"""WITH toks AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |scores AS (SELECT doc_id, cand, count(*) AS hits
        |  FROM toks JOIN ${TextQueries.lexiconSql} ON tok = marker
        |  GROUP BY doc_id, cand),
        |best AS (SELECT doc_id, cand AS pred_lang FROM (
        |    SELECT doc_id, cand, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY hits DESC, cand) AS rn
        |    FROM scores) WHERE rn = 1)
        |SELECT d.lang, coalesce(b.pred_lang, 'und') AS pred_lang,
        |  count(*)::BIGINT AS n_docs
        |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
        |GROUP BY 1, 2""".stripMargin),
      "Confusion matrix of the marker-lexicon language classifier " +
        "(text_langid) against the fixture's true lang labels: per " +
        "(true, predicted) cell, the document count — the eval that " +
        "turns a classifier operator into a measured model, feeding " +
        "per-class precision/recall and the 'und' abstention rate.  " +
        "Same broadcast-lexicon + per-doc argmax substrate as " +
        "text_langid (one corpus shuffle on doc_id), plus one " +
        "5x6-cell agg — the eval adds nothing to the scale cost."),
  )
}
