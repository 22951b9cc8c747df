package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps.{cosine, cosineSql}

/** Batch 39: two more canonical TPC-H shapes (Q10 returned-item
  * revenue, Q4 priority-distribution semi-join) and two embedding-space
  * evaluations (anisotropy audit, kNN label-classifier accuracy).
  */
object Curation45Queries {

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------- Q10 shape
    QueryDef(
      "tpch_q10_returned_items",
      (s, d) => {
        val rev = (floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("rev_e4")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        val nat = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))
        Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), rev)
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(col("rev_e4")).as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
        |  sum((floor(l_extendedprice * 100)::BIGINT)
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT
        |    AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin),
      "TPC-H Q10 returned-item revenue: which customers returned the " +
        "most value last quarter — returnflag filter pushed into the " +
        "lineitem scan, quarter filter into orders, customer + nation " +
        "broadcast, top-20 via TakeOrdered (no global sort " +
        "materializes).  One fact-fact shuffle on orderkey, exactly " +
        "like Q3/Q5: at 100 TB the lineitem scan dominates and every " +
        "other input rides broadcasts."),

    // --------------------------------------------- Q4 shape
    QueryDef(
      "tpch_q4_order_priority",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate"))
        ord.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") +
                expr("INTERVAL 60 DAYS"),
            "leftsemi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, count(*)::BIGINT AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate
        |                                   + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin),
      "TPC-H Q4 shape — order-priority distribution of LATE orders " +
        "(some line item shipped > 60 days after the order date; the " +
        "fixture has no commit/receipt dates, so ship-lag stands in " +
        "for Q4's commitdate < receiptdate): the EXISTS becomes a " +
        "LEFT SEMI join, which Spark executes without materializing " +
        "or duplicating matches — the orders side passes through at " +
        "most once per row regardless of line-item fan-out.  Date " +
        "range pushed to the orders scan; one semi shuffle on " +
        "orderkey; 5-row result."),

    // ----------------------------------- embedding anisotropy
    QueryDef(
      "embedding_anisotropy",
      (s, d) => {
        val n = Tables.embeddings(s, d).agg(count(lit(1)).as("n"))
        val pairs = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
          .crossJoin(broadcast(n))
          // deterministic derangement-ish partner: (7 id + 13) mod n
          .withColumn("partner",
            pmod(col("vec_id") * 7 + 13, col("n")))
          .filter(col("partner") =!= col("vec_id"))
        val scored = pairs.as("x").join(
            Tables.embeddings(s, d).select(col("vec_id").as("pid"),
              col("embedding").as("pe")),
            col("partner") === col("pid"))
          .select(col("x.vec_id"),
            floor(cosine(col("x.embedding"), col("pe")) * 1e6)
              .cast("long").as("cos_e6"))
        scored.agg(count(lit(1)).as("n_pairs"),
            expr("sum(cos_e6) div count(1)").as("mean_cos_e6"),
            count(when(col("cos_e6") < 0, lit(1))).as("n_negative"))
          .withColumn("neg_permille",
            expr("(1000 * n_negative) div n_pairs"))
      },
      Some(s"""WITH n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
        |p AS (SELECT vec_id, embedding,
        |    (vec_id * 7 + 13) % n.n AS partner
        |  FROM embeddings, n),
        |scored AS (SELECT p.vec_id,
        |    floor(${cosineSql("p.embedding", "e.embedding")} * 1e6)
        |      ::BIGINT AS cos_e6
        |  FROM p JOIN embeddings e ON e.vec_id = p.partner
        |  WHERE p.partner != p.vec_id)
        |SELECT count(*)::BIGINT AS n_pairs,
        |  (sum(cos_e6) // count(*))::BIGINT AS mean_cos_e6,
        |  count(CASE WHEN cos_e6 < 0 THEN 1 END)::BIGINT AS n_negative,
        |  ((1000 * count(CASE WHEN cos_e6 < 0 THEN 1 END)) // count(*))
        |    ::BIGINT AS neg_permille
        |FROM scored""".stripMargin),
      "Anisotropy audit of the embedding space: mean cosine over a " +
        "deterministic pseudo-random pairing ((7*id+13) mod n — a " +
        "fixed derangement-style partner, no RNG) plus the share of " +
        "negative-cosine pairs.  Isotropic representations average " +
        "near zero; a strongly positive mean is the 'narrow cone' " +
        "pathology (Ethayarajh 2019) that inflates all similarities " +
        "and motivates embedding_whiten.  Per-pair cosines are floored " +
        "to e6 integers before the order-independent sum, and the " +
        "pairing is a self-equi-join on the derived key — one shuffle, " +
        "n pairs, no sampling bias to audit."),

    // ---------------------------------- kNN label classifier eval
    QueryDef(
      "knn_label_accuracy",
      (s, d) => {
        val labels = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id"), col("label").cast("long").as("label"))
        val votes = GraphQueries.knnEdges(s, d)
          .join(labels.select(col("vec_id").as("dst"),
            col("label").as("nb_label")), Seq("dst"))
          .groupBy(col("src"), col("nb_label"))
          .agg(count(lit(1)).as("v"))
        val pred = votes
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("src"))
              .orderBy(col("v").desc, col("nb_label"))))
          .filter(col("rn") === 1)
          .select(col("src").as("vec_id"), col("nb_label").as("pred"))
        labels.join(pred, Seq("vec_id"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_nodes"),
            count(when(col("pred") === col("label"), lit(1)))
              .as("n_correct"))
          .withColumn("acc_permille",
            expr("(1000 * n_correct) div n_nodes"))
      },
      Some(s"""WITH ${GraphQueries.knnEdgesSql},
        |lab AS (SELECT vec_id, label::BIGINT AS label FROM embeddings
        |        WHERE vec_id < 300),
        |votes AS (SELECT e.src, l.label AS nb_label,
        |    count(*)::BIGINT AS v
        |  FROM edges e JOIN lab l ON l.vec_id = e.dst
        |  GROUP BY 1, 2),
        |pred AS (SELECT src AS vec_id, nb_label AS pred FROM (
        |    SELECT src, nb_label, row_number() OVER (PARTITION BY src
        |      ORDER BY v DESC, nb_label) AS rn FROM votes)
        |  WHERE rn = 1)
        |SELECT l.label, count(*)::BIGINT AS n_nodes,
        |  count(CASE WHEN p.pred = l.label THEN 1 END)::BIGINT
        |    AS n_correct,
        |  ((1000 * count(CASE WHEN p.pred = l.label THEN 1 END))
        |   // count(*))::BIGINT AS acc_permille
        |FROM lab l JOIN pred p ON p.vec_id = l.vec_id
        |GROUP BY l.label""".stripMargin),
      "Leave-one-out kNN classification accuracy of the label column " +
        "in embedding space (3-NN majority vote, ties to the lowest " +
        "label, self excluded by construction of the kNN edges): the " +
        "supervised twin of silhouette_by_label — silhouette scores " +
        "geometry, this scores PREDICTIVE value, and both feed the " +
        "go/no-go on trusting embeddings for weak labeling.  One " +
        "neighbor-label join + per-node argmax on the bounded slice; " +
        "at scale the vote rides whatever ANN candidate generation " +
        "built the edges."),
  )
}
