package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 37: structure-quality scoring — Newman modularity of the
  * detected communities, sketch-fidelity rank agreement (Kendall tau
  * between full-precision and random-projection distance orders), a
  * shingle-hash bit-balance audit, and rank-biased overlap drift of
  * top-term lists between corpus halves.
  */
object Curation43Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------ community modularity
    QueryDef(
      "community_modularity",
      (s, d) => {
        // one kNN build for BOTH the communities and the edge-side
        // aggregates (pre-optimization this query derived the graph
        // twice more on top of lpCommunities' own build: 56 parquet
        // scans / 70 exchanges in the unoptimized plan); comm is
        // referenced three times below (e_in twice, deg_c once), so
        // the 2-superstep propagation is materialized once as well
        val und = GraphQueries.undirectedKnn(s, d).localCheckpoint(true)
        val comm = GraphQueries.lpCommunitiesOver(s, d, und)
          .localCheckpoint(true)
        val mEdges = und.agg(count(lit(1)).as("m"))
        val deg = und.unionByName(
            und.select(col("b").as("a"), col("a").as("b")))
          .groupBy(col("a")).agg(count(lit(1)).as("deg"))
        val ein = und
          .join(comm.select(col("vec_id").as("a"), col("community").as("ca")),
            Seq("a"))
          .join(comm.select(col("vec_id").as("b"), col("community").as("cb")),
            Seq("b"))
          .filter(col("ca") === col("cb"))
          .groupBy(col("ca").as("community"))
          .agg(count(lit(1)).as("e_in"))
        val degC = deg
          .join(comm.select(col("vec_id").as("a"), col("community")),
            Seq("a"))
          .groupBy(col("community")).agg(sum(col("deg")).as("deg_c"))
        degC.join(ein, Seq("community"), "left")
          .na.fill(0L, Seq("e_in"))
          .crossJoin(broadcast(mEdges))
          .groupBy(col("m"))
          .agg(count(lit(1)).as("n_communities"),
            sum(lit(4L) * col("m") * col("e_in") -
              col("deg_c") * col("deg_c")).as("num"))
          .select(col("n_communities"), col("m").as("m_edges"),
            // Q = sum_c [e_in/m - (deg_c/2m)^2]; cross-multiplied to
            // one exact integer numerator, one final division.
            // num can be negative for anti-community splits: shift by
            // the denominator so the integer division operand is
            // non-negative in both engines (|Q| <= 1).
            expr("(1000000 * (num + 4 * m * m)) div (4 * m * m) - 1000000")
              .as("q_e6"))
      },
      Some(s"""WITH ${GraphQueries.knnEdgesSql},
        |${GraphQueries.lpCommunitiesSqlCtes},
        |mm AS (SELECT count(*)::BIGINT AS m FROM und),
        |deg AS (SELECT a, count(*)::BIGINT AS deg FROM adj GROUP BY a),
        |ein AS (SELECT ca.community, count(*)::BIGINT AS e_in
        |  FROM und
        |  JOIN comm ca ON ca.vec_id = und.a
        |  JOIN comm cb ON cb.vec_id = und.b
        |  WHERE ca.community = cb.community
        |  GROUP BY 1),
        |degc AS (SELECT c.community, sum(deg)::BIGINT AS deg_c
        |  FROM deg JOIN comm c ON c.vec_id = deg.a GROUP BY 1),
        |per AS (SELECT degc.community, deg_c,
        |    coalesce(e_in, 0)::BIGINT AS e_in
        |  FROM degc LEFT JOIN ein ON ein.community = degc.community)
        |SELECT count(*)::BIGINT AS n_communities, m AS m_edges,
        |  ((1000000 * (sum(4 * m * e_in - deg_c * deg_c) + 4 * m * m))
        |   // (4 * m * m) - 1000000)::BIGINT AS q_e6
        |FROM per, mm GROUP BY m""".stripMargin),
      "Newman modularity of the min-label-propagation communities over " +
        "the undirected kNN graph: Q = sum_c [e_in/m - (deg_c/2m)^2] " +
        "in e6 fixed point, cross-multiplied to a single exact integer " +
        "numerator — the quality score that says whether the detected " +
        "communities beat a random degree-preserving cut (Q > 0).  " +
        "label_propagation_communities EMITS a partition, this SCORES " +
        "it; together they are detection + evaluation.  Per-community " +
        "state only (e_in, deg_c): two equi-joins against the bounded " +
        "community table and one broadcast 1-row edge count."),

    // ---------------------------- sketch-fidelity rank agreement
    QueryDef(
      "ranker_agreement_tau",
      (s, d) => {
        import Vector2Queries.{quant, sqDist}
        // Projection dots are ~e10 on the e6 grid; rescale to ~e4 by
        // integer division (truncation toward zero in both engines)
        // before squaring, or the pairwise sqDist overflows int64.
        val raw = Tables.embeddings(s, d).filter(col("vec_id") < 60)
          .select(col("vec_id") +: quant(col("embedding")).as("qe") +:
            (0 until 8).map(j =>
              AnnQueries.intDot(col("embedding"), j).as(s"p$j")): _*)
        val base = raw.select(col("vec_id"), col("qe"),
          array((0 until 8).map(j => expr(s"p$j div 1000000")): _*)
            .as("pv"))
        val qs = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("qe").as("qqe"),
            col("pv").as("qpv"))
        val scored = qs.join(broadcast(base),
            col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id").as("cid"),
            sqDist(col("qqe"), col("qe")).as("d_full"),
            sqDist(col("qpv"), col("pv")).as("d_sketch"))
        scored.as("x").join(scored.as("y"),
            col("x.qid") === col("y.qid") && col("x.cid") < col("y.cid"))
          .groupBy(col("x.qid").as("qid"))
          .agg(count(lit(1)).as("n_pairs"),
            count(when(
              (col("x.d_full") < col("y.d_full") &&
                col("x.d_sketch") < col("y.d_sketch")) ||
                (col("x.d_full") > col("y.d_full") &&
                  col("x.d_sketch") > col("y.d_sketch")), lit(1)))
              .as("concordant"),
            count(when(
              (col("x.d_full") < col("y.d_full") &&
                col("x.d_sketch") > col("y.d_sketch")) ||
                (col("x.d_full") > col("y.d_full") &&
                  col("x.d_sketch") < col("y.d_sketch")), lit(1)))
              .as("discordant"))
          .withColumn("tau_e3",
            expr("(1000 * (concordant - discordant + n_pairs))" +
              " div n_pairs - 1000"))
      },
      Some(s"""WITH comps AS (SELECT vec_id, pl.j,
        |    sum(floor(embedding[pl.d + 1]::DOUBLE * 1000000)::BIGINT
        |        * pl.w) AS dotj
        |  FROM embeddings CROSS JOIN ${AnnQueries.planesSql}
        |  WHERE vec_id < 60 GROUP BY vec_id, pl.j),
        |pv AS (SELECT vec_id, list(dotj // 1000000 ORDER BY j) AS pv
        |       FROM comps GROUP BY vec_id),
        |base AS (SELECT e.vec_id,
        |    ${Vector2Queries.quantSql.format("e.embedding")} AS qe, pv.pv
        |  FROM embeddings e JOIN pv ON pv.vec_id = e.vec_id
        |  WHERE e.vec_id < 60),
        |scored AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
        |    ${Vector2Queries.sqDistSql("a.qe", "b.qe")} AS d_full,
        |    ${Vector2Queries.sqDistSql("a.pv", "b.pv")} AS d_sketch
        |  FROM base a JOIN base b ON b.vec_id != a.vec_id
        |  WHERE a.vec_id < 10)
        |SELECT x.qid, count(*)::BIGINT AS n_pairs,
        |  count(CASE WHEN (x.d_full < y.d_full AND x.d_sketch < y.d_sketch)
        |          OR (x.d_full > y.d_full AND x.d_sketch > y.d_sketch)
        |        THEN 1 END)::BIGINT AS concordant,
        |  count(CASE WHEN (x.d_full < y.d_full AND x.d_sketch > y.d_sketch)
        |          OR (x.d_full > y.d_full AND x.d_sketch < y.d_sketch)
        |        THEN 1 END)::BIGINT AS discordant,
        |  ((1000 * (count(CASE WHEN (x.d_full < y.d_full
        |              AND x.d_sketch < y.d_sketch)
        |          OR (x.d_full > y.d_full AND x.d_sketch > y.d_sketch)
        |        THEN 1 END)
        |    - count(CASE WHEN (x.d_full < y.d_full
        |              AND x.d_sketch > y.d_sketch)
        |          OR (x.d_full > y.d_full AND x.d_sketch < y.d_sketch)
        |        THEN 1 END) + count(*))) // count(*) - 1000)::BIGINT
        |    AS tau_e3
        |FROM scored x JOIN scored y ON x.qid = y.qid AND x.cid < y.cid
        |GROUP BY x.qid""".stripMargin),
      "Sketch-fidelity rank agreement: per query, Kendall tau-a " +
        "between the FULL-precision distance order (exact integer " +
        "squared L2 on the e6 grid) and the 8-dim random-projection " +
        "sketch order over 59 candidates — measuring exactly how much " +
        "ranking the JL sketch (random_projection_reduce) preserves " +
        "before you trust it as a coarse filter.  Tau near 1000 " +
        "licenses sketch-first pruning; the shifted numerator keeps " +
        "the integer division non-negative in both engines.  The " +
        "pairwise stage is per-query over a bounded candidate panel — " +
        "corpus growth only widens the embarrassingly-parallel scan."),

    // --------------------------------- shingle-hash bit balance
    QueryDef(
      "shingle_bit_balance",
      (s, d) => {
        import graft.functions.MinHashKernel.shingleHashes
        val sh = Tables.documents(s, d)
          .select(col("doc_id"), explode(shingleHashes(col("text"))).as("sh"))
        val tot = sh.agg(count(lit(1)).as("n_total"))
        sh.select(explode(sequence(lit(0L), lit(30L))).as("bit"), col("sh"))
          .withColumn("isset",
            expr("shiftright(sh, cast(bit as int)) & 1"))
          .groupBy(col("bit"))
          .agg(sum(col("isset")).as("n_set"))
          .crossJoin(broadcast(tot))
          .select(col("bit"), col("n_set"), col("n_total"),
            expr("(1000 * n_set) div n_total").as("share_permille"))
      },
      Some("""WITH sh AS (SELECT doc_id,
        |    ((('0x' || substr(md5(concat_ws(' ', toks[i.i+1], toks[i.i+2],
        |        toks[i.i+3])), 1, 8))::BIGINT) % 2147483647) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents),
        |       (SELECT range AS i FROM range(0, 4096)) i
        |  WHERE len(toks) >= 3 AND i.i <= len(toks) - 3
        |  GROUP BY doc_id, sh),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM sh),
        |bits AS (SELECT b.bit, sh.sh FROM sh,
        |         (SELECT range::BIGINT AS bit FROM range(0, 31)) b)
        |SELECT bit, sum((sh >> bit::INT) & 1)::BIGINT AS n_set, n_total,
        |  ((1000 * sum((sh >> bit::INT) & 1)) // n_total)::BIGINT
        |    AS share_permille
        |FROM bits, tot GROUP BY bit, n_total""".stripMargin),
      "Bit-balance audit of the 31-bit shingle-hash space (per-doc " +
        "distinct multiset, the exact substrate minhash/LSH mixes " +
        "over): per bit position, the share of hashes with that bit " +
        "set — a healthy md5-derived hash sits near 500 permille on " +
        "every LOW bit (bit 30 is depressed: values are uniform on " +
        "[0, 2^31-1) mod p, not a full power of two, and the spec " +
        "pins exactly that shape).  Skewed bits would break the " +
        "uniformity assumption behind every banding-probability " +
        "estimate (minhash_band_tuning).  One generator fan-out of " +
        "31 bit rows per hash — no shuffle beyond the 31-row agg."),

    // ----------------------------- rank-biased overlap drift
    QueryDef(
      "rbo_topterm_drift",
      (s, d) => {
        // RBO(p=0.9) @10 between the top-10 term lists (by doc freq) of
        // the even-id and odd-id corpus halves.  Weights p^(d-1) are
        // Scala-computed e6 literals inlined into BOTH engines; the
        // per-depth agreement overlap/d is made exact by scaling with
        // lcm(1..10) = 2520 — zero float ops anywhere in the plan.
        val w = (1 to 10).map(dd =>
          (dd.toLong, math.round(math.pow(0.9, dd - 1) * 1e6)))
        def half(par: Int) = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(2)) === par)
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("df").desc, col("tok"))).cast("long"))
          .filter(col("rk") <= 10)
        val ev = half(0).select(col("tok"), col("rk").as("rk_a"))
        val od = half(1).select(col("tok"), col("rk").as("rk_b"))
        val weights = w.map { case (dd, wi) =>
          struct(lit(dd).as("depth"), lit(wi).as("w_e6"))
        }
        val depths = s.range(1)
          .select(explode(array(weights: _*)).as("dw"))
          .select(col("dw.depth"), col("dw.w_e6"))
        val joined = ev.join(od, Seq("tok"), "full")
        val agree = depths.join(broadcast(joined),
            (coalesce(col("rk_a"), lit(99L)) <= col("depth")) &&
              (coalesce(col("rk_b"), lit(99L)) <= col("depth")),
            "left")
          .groupBy(col("depth"), col("w_e6"))
          .agg(count(col("tok")).as("overlap"))
        agree
          .agg(sum(col("w_e6")).as("wsum"),
            sum(col("w_e6") * col("overlap") * expr("2520 div depth"))
              .as("wagree_s"))
          .select(col("wsum"), col("wagree_s"),
            expr("(1000 * wagree_s) div (2520 * wsum)").as("rbo_permille"))
      },
      Some(s"""WITH ha AS (SELECT tok, rk FROM (
        |    SELECT tok, row_number() OVER (ORDER BY df DESC, tok) AS rk
        |    FROM (SELECT tok, count(*)::BIGINT AS df FROM (
        |        SELECT DISTINCT doc_id, unnest(string_split(text, ' '))
        |          AS tok FROM documents WHERE doc_id % 2 = 0)
        |      GROUP BY tok)) WHERE rk <= 10),
        |hb AS (SELECT tok, rk FROM (
        |    SELECT tok, row_number() OVER (ORDER BY df DESC, tok) AS rk
        |    FROM (SELECT tok, count(*)::BIGINT AS df FROM (
        |        SELECT DISTINCT doc_id, unnest(string_split(text, ' '))
        |          AS tok FROM documents WHERE doc_id % 2 = 1)
        |      GROUP BY tok)) WHERE rk <= 10),
        |j AS (SELECT coalesce(ha.tok, hb.tok) AS tok,
        |    coalesce(ha.rk, 99) AS rk_a, coalesce(hb.rk, 99) AS rk_b
        |  FROM ha FULL JOIN hb ON ha.tok = hb.tok),
        |dw AS (SELECT * FROM (VALUES ${
          (1 to 10).map(dd => s"(${dd}::BIGINT, ${
            math.round(math.pow(0.9, dd - 1) * 1e6)}::BIGINT)")
            .mkString(", ")}) dw(depth, w_e6)),
        |agree AS (SELECT depth, w_e6, count(j.tok)::BIGINT AS overlap
        |  FROM dw LEFT JOIN j ON j.rk_a <= dw.depth AND j.rk_b <= dw.depth
        |  GROUP BY 1, 2)
        |SELECT sum(w_e6)::BIGINT AS wsum,
        |  sum(w_e6 * overlap * (2520 // depth))::BIGINT AS wagree_s,
        |  ((1000 * sum(w_e6 * overlap * (2520 // depth)))
        |   // (2520 * sum(w_e6)))::BIGINT AS rbo_permille
        |FROM agree""".stripMargin),
      "Rank-biased overlap (Webber et al. 2010, p=0.9, depth 10) " +
        "between the top-10 document-frequency term lists of the " +
        "even/odd corpus halves: RBO weights prefix agreement " +
        "geometrically, so churn at rank 1 costs more than at rank 10 " +
        "— the standard top-k drift metric where plain set overlap is " +
        "rank-blind.  Weights are pinned e6 literals (both engines " +
        "evaluate round(0.9^d * 1e6) on doubles — exactly " +
        "representable grid), prefix agreement is an integer count, " +
        "and the one division per depth happens on e6 integers.  " +
        "Everything after the two DF aggs runs on 10-row tables."),
  )
}
