package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps._

/** Batch 56: graph-based ANN — NSW-style greedy beam search over the
  * kNN graph, the one modern ANN index family the engine did not yet
  * demonstrate (IVF, LSH, multiprobe and PQ are in).  The search is a
  * FIXED-DEPTH unrolled expansion (3 rounds, beam 8) from fixed entry
  * points, so it is fully declarative, deterministic, and expressible
  * as an identical DuckDB oracle — and its cost model is the point:
  * per query it touches at most beam x degree x rounds nodes, a
  * constant, INDEPENDENT of corpus size.  That bounded-touch property
  * (plus an insertion order that keeps the graph navigable) is exactly
  * why HNSW-family indexes are the production default at vector-store
  * scale; the hierarchy is an optimization of the entry point, not of
  * this search loop.
  */
object Curation56Queries {

  private val Beam = 8
  private val Rounds = 3
  private val EntrySeeds = Seq(17L, 93L, 171L, 247L)

  // one build per (application, sf dir): the index is BUILT once and
  // WRITTEN; every searcher reads the materialized edge table (see
  // nnDescentEdges); memo + collision safety + shutdown cleanup live
  // in graft.Scratch.buildOnce (shared with scale.scala's layouts)
  private def materializedOnce(s: org.apache.spark.sql.SparkSession,
      d: String, kind: String)(build: => DataFrame): DataFrame =
    s.read.parquet(graft.Scratch.buildOnce(s, d, kind)(
      p => build.write.mode("overwrite").parquet(p)))

  /** NN-descent kNN graph over the 300-vector slice: k=5, 4 local-join
    * rounds from id-arithmetic seeds. Shared by knn_graph_nn_descent
    * (which emits it) and ann_graph_hier_topk (which searches it).
    *
    * Each round is CHECKPOINTED to parquet and read back before the
    * next round plans against it.  Two reasons, both fatal without it:
    * (1) execution — a round references its predecessor FIVE times
    * (union + two self-joins), so the inlined plan re-expands 5^rounds
    * copies of round 0 (measured minutes of recompute for a 1500-edge
    * graph); (2) the LOGICAL PLAN itself goes exponential, and since
    * the searcher then references the graph once per beam round, the
    * driver OOMs during analysis before a single task runs (persist()
    * fixes only (1): CacheManager dedups execution, not the analyzed
    * tree).  Writing each round is the iterative-algorithm shape the
    * CC fixpoint (graph.scala) uses via localCheckpoint, done here as
    * a reliable parquet checkpoint instead so no cache blocks escape
    * the QueryDef contract and the final index is exactly what a
    * cluster deployment ships: an edge TABLE, built once (memoized per
    * app+dataset, the layoutOnce pattern from scale.scala), searched
    * many times.  The DuckDB oracle mirrors the boundaries with AS
    * MATERIALIZED on each round's CTE. */
  private[graft] def nnDescentEdges(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    // once-only build, collision-proof path key, shutdown cleanup: all
    // via graft.Scratch.buildOnce; rounds land under base/r0..r4
    val base = graft.Scratch.buildOnce(s, d, "nnd") { base =>
      nnDescentOver(s,
        Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id").as("cid"), col("embedding").as("ce")),
        base, n = 300L)
    }
    s.read.parquet(s"$base/r4")
  }

  /** The NN-descent construction itself, corpus-generic: k=5, 4
    * local-join rounds from id-arithmetic ring seeds over `corpus`
    * (cid, ce) with ids 0..n-1; writes rounds under base/r0..r4.
    * ONE definition shared by the registry build above and the
    * recall-evaluation specs (which also build over CLUSTERED
    * fixtures), so the measured curves measure the shipping
    * construction, never a drifted copy. */
  private[graft] def nnDescentOver(s: org.apache.spark.sql.SparkSession,
      e: DataFrame, base: String, n: Long): Unit = {
    val k = 5
    val seeds = e.select(col("cid").as("src"))
      .withColumn("dst", explode(array(
        Seq(1L, 7L, 31L, 73L, 151L).map(o =>
          pmod(col("src") + lit(o), lit(n))): _*)))
    def topK(cand: DataFrame) = cand
      .distinct()
      .filter(col("src") =!= col("dst"))
      .join(e.select(col("cid").as("src"), col("ce").as("se")), "src")
      .join(e.select(col("cid").as("dst"), col("ce").as("de")), "dst")
      .select(col("src"), col("dst"),
        cosine(col("se"), col("de")).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("dst"))))
      .filter(col("rnk") <= k)
      .select(col("src"), col("dst"))
    def ckpt(df: DataFrame, tag: String): DataFrame = {
      val p = s"$base/$tag"
      df.write.mode("overwrite").parquet(p)
      s.read.parquet(p)
    }
    var g = ckpt(topK(seeds), "r0")
    for (r <- 1 to 4) {
      val fwd = g.as("a").join(g.as("b"),
          col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      val rev = g.as("a").join(g.as("b"),
          col("a.dst") === col("b.dst"))
        .select(col("a.src").as("src"), col("b.src").as("dst"))
      g = ckpt(topK(g.unionByName(fwd).unionByName(rev)), s"r$r")
    }
  }

  /** The (cid, ce) corpus slice the graph-ANN family indexes. */
  private[graft] def hierCorpus(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 300)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  /** Symmetrized, deduped adjacency over the WRITTEN NN-descent index. */
  private[graft] def hierAdjacency(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val ed = nnDescentEdges(s, d)
    ed.unionByName(ed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** Centroid-routed bounded beam search over a built adjacency —
    * shared VERBATIM by the ann_graph_hier_topk registry query and the
    * streaming serving path (Streams.serveAnn), so an online answer is
    * the batch plan by construction. Columns: `q` (qid, qe), `e`
    * (cid, ce), `und` (src, dst). Per query the search touches at most
    * beam*degree*rounds corpus rows — constant, corpus-size
    * independent. */
  /** Per-query bounded top-b re-rank: score candidates with the kernel
    * cosine, keep b per query by (cos DESC, cid). The window
    * partitions on qid over a BOUNDED set (<= beam * (degree + 1) rows
    * per query), never corpus rows. ONE definition shared by every
    * graph-ANN search variant (fixed-entry, routed, insert) so the
    * tie-break and scoring can never drift between them. */
  private def topBOver(q: DataFrame, e: DataFrame)(
      cands: DataFrame, b: Int): DataFrame = cands
    // dedup rides the SAME qid exchange the rank window needs:
    // groupBy(qid)+collect_set(cid)+explode produces exactly
    // distinct()'s rows (the candidate set per query is bounded by
    // beam*(degree+1), so the set state is constant-sized) but leaves
    // the stream hash-partitioned by qid, which the broadcast joins
    // preserve and the window then consumes with NO second exchange —
    // one shuffle per beam round instead of two (5 rounds per search).
    .groupBy(col("qid")).agg(collect_set(col("cid")).as("cids"))
    .select(col("qid"), explode(col("cids")).as("cid"))
    .join(e, "cid").join(broadcast(q), "qid")
    .filter(col("qid") =!= col("cid"))
    .select(col("qid"), col("cid"),
      cosine(col("qe"), col("ce")).as("cos"))
    .withColumn("rnk", row_number().over(
      Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("cid"))))
    .filter(col("rnk") <= b)

  /** The unrolled bounded beam expansion from an entry candidate set
    * (fixed seeds or routed centroids): top-8 of the entries, Rounds
    * greedy adjacency expansions, final top-k re-rank. */
  private[graft] def beamRounds(q: DataFrame, e: DataFrame,
      und: DataFrame, entries: DataFrame, finalK: Int,
      beamWidth: Int = Beam): DataFrame = {
    val topB = topBOver(q, e) _
    // Kept as an inlined unroll (one action; materialization per round
    // measured slower in r14: eager localCheckpoint +0.8 s, persist()
    // +3 s of CacheManager canonicalization) — but unlike the r14
    // form, each round now references its predecessor ONCE: the old
    // `beam.join(und) union beam` held TWO copies of the prior round,
    // so the logical tree grew 2^Rounds copies of the entry subtree
    // (runtime exchange reuse deduplicated the execution, but Catalyst
    // still analyzed/optimized the exponential tree — the measured
    // driver-side cost).  The left join + explode(array(cid, dst))
    // emits the self row AND every neighbor from a single reference,
    // so the tree is LINEAR in Rounds; the candidate SET per query is
    // unchanged (dedup in topBOver), hence identical results.
    var beam = topB(entries, beamWidth).select(col("qid"), col("cid"))
    for (_ <- 1 to Rounds) {
      val expand = beam.join(und, col("cid") === col("src"), "left")
        .select(col("qid"),
          explode(array(col("cid"), col("dst"))).as("cid"))
        .filter(col("cid").isNotNull)
      beam = topB(expand, beamWidth).select(col("qid"), col("cid"))
    }
    topB(beam, finalK)
      .select(col("qid"), col("cid"), col("rnk").cast("bigint")
        .as("rank"),
        floor(col("cos") * 1000000).cast("bigint").as("score_e6"))
  }

  private[graft] def hierBeamSearch(q: DataFrame, e: DataFrame,
      und: DataFrame, finalK: Int = 3,
      beamWidth: Int = Beam): DataFrame = {
    // centroid grid restricted to graph nodes (vec_id % 31 == 7,
    // same construction as ann_ivf_topk)
    val cents = e.filter(pmod(col("cid"), lit(31)) === 7)
    // route: 2 nearest centroids per query are the entry beam
    val entries = broadcast(q).crossJoin(cents)
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce")).as("ccos"))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("ccos").desc, col("cid"))))
      .filter(col("crn") <= 2)
      .select(col("qid"), col("cid"))
    beamRounds(q, e, und, entries, finalK, beamWidth)
  }

  /** Oracle-side mirrors of the beam machinery — ONE text per piece,
    * interpolated into all three searching oracles, for the same
    * no-drift reason as [[topBOver]]. */
  private def annB0Sql(entriesCte: String): String =
    s"""scored_b0 AS (SELECT c.qid, c.cid,
       |    ${cosineSql("q.qe", "e.ce")} AS cos
       |  FROM $entriesCte c JOIN e ON e.cid = c.cid
       |  JOIN q ON q.qid = c.qid
       |  WHERE c.qid <> c.cid),
       |b0 AS (SELECT qid, cid FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, cid) AS rnk FROM scored_b0)
       |  WHERE rnk <= $Beam)""".stripMargin

  private def annRoundSql(prev: String, out: String): String =
    s"""cands_$out AS (SELECT DISTINCT qid, cid FROM (
       |    SELECT b.qid, u.dst AS cid
       |    FROM $prev b JOIN und u ON u.src = b.cid
       |    UNION ALL SELECT qid, cid FROM $prev)),
       |scored_$out AS (SELECT c.qid, c.cid,
       |    ${cosineSql("q.qe", "e.ce")} AS cos
       |  FROM cands_$out c JOIN e ON e.cid = c.cid
       |  JOIN q ON q.qid = c.qid
       |  WHERE c.qid <> c.cid),
       |$out AS MATERIALIZED (SELECT qid, cid FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, cid) AS rnk FROM scored_$out)
       |  WHERE rnk <= $Beam)""".stripMargin

  private def annRoundsSql: String =
    s"""${annRoundSql("b0", "b1")},
       |${annRoundSql("b1", "b2")},
       |${annRoundSql("b2", "b3")}""".stripMargin

  private def annFinalSql(k: Int): String =
    s"""SELECT c.qid, c.cid, rnk::BIGINT AS rank,
       |  floor(cos * 1000000)::BIGINT AS score_e6
       |FROM (SELECT qid, cid, cos, row_number() OVER (
       |    PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |  FROM scored_b3) c
       |WHERE rnk <= $k""".stripMargin

  /** Each indexed node's worst current out-edge score on the e6 grid —
    * the displacement threshold for insertion. STATIC per built index:
    * one partial-aggregated groupBy over the k-bounded edge list. */
  private[graft] def worstEdges(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    worstEdgesOf(hierCorpus(s, d), nnDescentEdges(s, d))

  /** Corpus-generic worst-edge table over a DIRECTED edge list — ONE
    * definition shared by the registry query path above and the
    * end-to-end scenario spec (which indexes a versioned corpus). */
  private[graft] def worstEdgesOf(e: DataFrame, g: DataFrame)
      : DataFrame = {
    g
      .join(e.select(col("cid").as("src"), col("ce").as("se")), "src")
      .join(e.select(col("cid").as("dst"), col("ce").as("de")), "dst")
      .select(col("src"), cosine(col("se"), col("de")).as("cos"))
      .groupBy(col("src"))
      .agg(floor(min(col("cos")) * 1000000).cast("bigint")
        .as("displaced_e6"))
  }

  /** The HNSW insertion computation shared by the ann_index_insert
    * registry query and the streaming maintenance path
    * (Streams.insertAnn): routed beam search finds each new vector's
    * k=5 forward edges; the back-edge decision joins the static
    * worst-edge table — the new vector displaces a linked node's worst
    * out-edge iff it strictly beats it on the e6 grid. */
  private[graft] def insertEdges(newV: DataFrame, e: DataFrame,
      und: DataFrame, worst: DataFrame): DataFrame = {
    val fwd = hierBeamSearch(newV, e, und, finalK = 5)
    fwd.join(worst, fwd("cid") === worst("src"))
      .select(col("qid").as("new_id"), col("cid").as("dst"),
        col("rank"), col("score_e6"), col("displaced_e6"),
        (col("score_e6") > col("displaced_e6")).as("back_inserted"))
  }

  /** The delete-repair computation shared by the ann_index_delete
    * registry query and the streaming maintenance path
    * (Streams.deleteAnn). `delNow` is the batch of deletions to
    * repair for; `tomb` is the FULL tombstone set so far (a superset
    * of delNow — equal to it in the one-shot batch query): survivors
    * are nodes outside `tomb`, kept/candidate edges exclude `tomb`,
    * and each affected survivor refills exactly the edges it lost to
    * `delNow` from the deleted nodes' own out-neighbors, re-ranked by
    * the kernel cosine. With delNow == tomb this is exactly the
    * one-shot delete semantics the DuckDB oracle mirrors. */
  private[graft] def deleteRepair(delNow: DataFrame, tomb: DataFrame,
      g: DataFrame, e: DataFrame): DataFrame = {
    val liveSrc = g.join(tomb, g("src") === tomb("del"), "left_anti")
    val surv = liveSrc
      .join(tomb, liveSrc("dst") === tomb("del"), "left_anti")
    val dead = liveSrc.join(delNow, liveSrc("dst") === delNow("del"))
      .select(col("src"), col("del"))
    val lost = dead.groupBy(col("src"))
      .agg(count(lit(1)).as("n_lost"))
    val cand = dead
      .join(g.select(col("src").as("del"), col("dst").as("cand")),
        "del")
      .select(col("src"), col("cand"))
      .filter(col("src") =!= col("cand"))
      .join(tomb.select(col("del").as("cand")), Seq("cand"),
        "left_anti")
      .join(surv.select(col("src"), col("dst").as("cand")),
        Seq("src", "cand"), "left_anti")
      .distinct()
    cand
      .join(e.select(col("cid").as("src"), col("ce").as("se")), "src")
      .join(e.select(col("cid").as("cand"), col("ce").as("de")),
        "cand")
      .select(col("src"), col("cand"),
        cosine(col("se"), col("de")).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("cand"))))
      .join(lost, "src")
      .filter(col("rnk") <= col("n_lost"))
      .select(col("src"), col("cand").as("new_dst"),
        col("rnk").cast("bigint").as("fill_rank"),
        floor(col("cos") * 1000000).cast("bigint").as("cos_e6"),
        col("n_lost"))
  }

  /** The insert pipeline's oracle CTE chain after nnDescentSqlCtes —
    * und/e/q + routed search + the k=5 forward-edge table `fwd`.
    * Shared by the ann_index_insert and ann_index_consolidate
    * oracles. */
  private def insertFwdSqlCtes: String =
    s"""und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM g4
       |    UNION ALL SELECT dst, src FROM g4)),
       |e AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce
       |      FROM base),
       |q AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qe
       |      FROM embeddings WHERE vec_id >= 300 AND vec_id < 320),
       |$annEntriesSql,
       |${annB0Sql("entries")},
       |$annRoundsSql,
       |fwd AS MATERIALIZED (SELECT qid, cid, rnk::BIGINT AS rank,
       |    floor(cos * 1000000)::BIGINT AS score_e6
       |  FROM (SELECT qid, cid, cos, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM scored_b3)
       |  WHERE rnk <= 5)""".stripMargin

  /** Centroid routing: cents grid + 2 nearest centroids per query —
    * the oracle mirror of [[hierBeamSearch]]'s entry construction,
    * shared by the hier search and the insert oracles. */
  private def annEntriesSql: String =
    s"""cents AS (SELECT cid, ce FROM e WHERE cid % 31 = 7),
       |entries AS (SELECT qid, cid FROM (
       |    SELECT q.qid, c.cid, row_number() OVER (
       |      PARTITION BY q.qid ORDER BY
       |        ${cosineSql("q.qe", "c.ce")} DESC, c.cid) AS crn
       |    FROM q CROSS JOIN cents c)
       |  WHERE crn <= 2)""".stripMargin

  /** The matching DuckDB CTE chain: defines `base` (the slice) and
    * `g4` (the final edge list); prepend after WITH. */
  private[queries] val nnDescentSqlCtes: String = {
    // AS MATERIALIZED on base and each round's graph: the local-join
    // CTEs reference their predecessor 3x, so DuckDB's default CTE
    // INLINING re-expands the whole chain 3^rounds times (fd
    // exhaustion + exponential scans) — materialization evaluates
    // each round once, mirroring the persist() on the Spark side
    def topk(cand: String, out: String): String =
      s"""scored_$out AS (SELECT c.src, c.dst,
         |    ${cosineSql("es.embedding", "ed.embedding")} AS cos
         |  FROM (SELECT DISTINCT src, dst FROM $cand
         |        WHERE src <> dst) c
         |  JOIN base es ON es.vec_id = c.src
         |  JOIN base ed ON ed.vec_id = c.dst),
         |$out AS MATERIALIZED (SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src
         |      ORDER BY cos DESC, dst) AS rnk FROM scored_$out)
         |  WHERE rnk <= 5)""".stripMargin
    def localJoin(prev: String, out: String): String =
      s"""$out AS (SELECT src, dst FROM $prev
         |  UNION ALL SELECT a.src, b.dst FROM $prev a
         |    JOIN $prev b ON a.dst = b.src
         |  UNION ALL SELECT a.src, b.src FROM $prev a
         |    JOIN $prev b ON a.dst = b.dst)""".stripMargin
    s"""base AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
       |              WHERE vec_id < 300),
       |seeds AS (SELECT vec_id AS src,
       |    (vec_id + o.o) % 300 AS dst
       |  FROM base, (VALUES (1),(7),(31),(73),(151)) o(o)),
       |${topk("seeds", "g0")},
       |${localJoin("g0", "c1")},
       |${topk("c1", "g1")},
       |${localJoin("g1", "c2")},
       |${topk("c2", "g2")},
       |${localJoin("g2", "c3")},
       |${topk("c3", "g3")},
       |${localJoin("g3", "c4")},
       |${topk("c4", "g4")}""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ann_graph_topk",
      (s, d) => {
        // corpus slice + queries (same bounded construction as
        // knn_graph / the other ann_* queries)
        val e = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val ed = GraphQueries.knnEdges(s, d)
        val und = ed.unionByName(
            ed.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        // fixed entry points -> beam; then Rounds greedy expansions
        // through the SHARED beamRounds/topBOver machinery
        val seeds = q.select(col("qid")).withColumn("cid",
          explode(array(EntrySeeds.map(lit): _*)))
        beamRounds(q, e, und, seeds, finalK = 3)
      },
      Some {
        val seedVals = EntrySeeds.map(v => s"($v)").mkString(",")
        s"""WITH ${GraphQueries.knnEdgesSql},
           |und AS (SELECT DISTINCT src, dst FROM (
           |    SELECT src, dst FROM edges
           |    UNION ALL SELECT dst, src FROM edges)),
           |e AS (SELECT vec_id AS cid, embedding AS ce FROM base),
           |q AS (SELECT vec_id AS qid, embedding AS qe
           |      FROM embeddings WHERE vec_id < 10),
           |seed AS (SELECT qid, s.cid::BIGINT AS cid
           |         FROM q, (VALUES $seedVals) s(cid)),
           |${annB0Sql("seed")},
           |$annRoundsSql
           |${annFinalSql(3)}""".stripMargin
      },
      "Graph-based ANN (NSW-style): greedy beam search over the k=3 " +
        "kNN graph — 4 fixed entry points, beam 8, 3 unrolled " +
        "expansion rounds, final top-3 per query.  Every round is " +
        "(bounded beam) JOIN (bounded-degree adjacency) -> re-rank, " +
        "so a query touches <= beam*degree*rounds nodes regardless of " +
        "corpus size — the property that makes navigable-small-world " +
        "indexes the production ANN default; HNSW adds a hierarchy " +
        "only to pick better entry points.  All scoring on the " +
        "bit-parity cosine kernel; deterministic (cos DESC, cid) " +
        "tie-breaks end to end.  Recall vs brute force is measured in " +
        "AnnRecallSpec alongside the IVF and LSH paths."),

    QueryDef(
      "kendall_tau_full",
      (s, d) => {
        // CORPUS-EXACT Kendall tau-b per language — the scalable
        // upgrade of kendall_tau_length's bounded 100-doc sample.
        // Key identity: concordance/discordance only depend on VALUE
        // comparisons, so compact the corpus to its joint (x, y)
        // histogram first (one partial-aggregated shuffle; cell count
        // is bounded by the VALUE domain |x|*|y|, not corpus rows) and
        // classify CELL pairs weighted by cnt_a*cnt_b.  Tie terms need
        // only the 1-D marginals (sum of C(m,2) per x-group/y-group),
        // never the pair join.  At extreme value domains, quantize
        // x/y first — same pipeline, coarser cells.
        // Numeric range: everything through cd is int64-exact while
        // n-per-lang stays under ~4.3e9 (n0 = C(n,2) caps int64) and
        // no single cell pair's weight product tops 2^63 — past that,
        // shard by lang-hash and merge the four counters, or quantize
        // first; the tau tail guards the all-tied denominator (n0 = nx
        // or n0 = ny -> NULL, both engines) instead of emitting NaN.
        val base = Tables.documents(s, d).select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("x"),
          col("n_chars").as("y"))
        val cells = base.groupBy(col("lang"), col("x"), col("y"))
          .agg(count(lit(1)).as("cnt"))
        // each unordered cell pair once: lexicographic (x, y) order
        val pairs = cells.as("a").join(cells.as("b"),
          col("a.lang") === col("b.lang") &&
            (col("a.x") < col("b.x") ||
              (col("a.x") === col("b.x") && col("a.y") < col("b.y"))))
          .select(col("a.lang").as("lang"),
            (col("a.cnt") * col("b.cnt")).as("w"),
            ((col("b.x") - col("a.x")) * (col("b.y") - col("a.y")))
              .as("prod"))
        val cd = pairs.groupBy(col("lang")).agg(
          sum(when(col("prod") > 0, col("w")).otherwise(0L)).as("c"),
          sum(when(col("prod") < 0, col("w")).otherwise(0L)).as("dd"))
        def tiePairs(keyCol: String, out: String) = base
          .groupBy(col("lang"), col(keyCol)).agg(count(lit(1)).as("m"))
          .groupBy(col("lang"))
          .agg(sum(expr("m * (m - 1) div 2")).as(out))
        val n0 = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .select(col("lang"), col("n"),
            expr("n * (n - 1) div 2").as("n0"))
        n0.join(cd, "lang")
          .join(tiePairs("x", "nx"), "lang")
          .join(tiePairs("y", "ny"), "lang")
          .select(col("lang"), col("n").as("n_docs"), col("c"), col("dd"),
            when(col("n0") > col("nx") && col("n0") > col("ny"),
              floor((col("c") - col("dd")).cast("double") * lit(1000.0) /
                (sqrt((col("n0") - col("nx")).cast("double")) *
                  sqrt((col("n0") - col("ny")).cast("double"))))
                .cast("bigint")).as("tau_e3"))
      },
      Some("""WITH base AS (SELECT lang,
        |    len(string_split(text, ' '))::BIGINT AS x, n_chars AS y
        |  FROM documents),
        |cells AS (SELECT lang, x, y, count(*)::BIGINT AS cnt
        |  FROM base GROUP BY 1, 2, 3),
        |pairs AS (SELECT a.lang, a.cnt * b.cnt AS w,
        |    (b.x - a.x) * (b.y - a.y) AS prod
        |  FROM cells a JOIN cells b ON a.lang = b.lang
        |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))),
        |cd AS (SELECT lang,
        |    sum(CASE WHEN prod > 0 THEN w ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN prod < 0 THEN w ELSE 0 END)::BIGINT AS dd
        |  FROM pairs GROUP BY lang),
        |tx AS (SELECT lang, sum(m * (m - 1) // 2)::BIGINT AS nx FROM (
        |    SELECT lang, x, count(*)::BIGINT AS m FROM base GROUP BY 1, 2)
        |  GROUP BY lang),
        |ty AS (SELECT lang, sum(m * (m - 1) // 2)::BIGINT AS ny FROM (
        |    SELECT lang, y, count(*)::BIGINT AS m FROM base GROUP BY 1, 2)
        |  GROUP BY lang),
        |nn AS (SELECT lang, count(*)::BIGINT AS n,
        |    (count(*) * (count(*) - 1) // 2)::BIGINT AS n0
        |  FROM base GROUP BY lang)
        |SELECT nn.lang, n AS n_docs, c, dd,
        |  CASE WHEN n0 > nx AND n0 > ny THEN
        |    floor((c - dd)::DOUBLE * 1000.0
        |          / (sqrt((n0 - nx)::DOUBLE) * sqrt((n0 - ny)::DOUBLE)))
        |      ::BIGINT END AS tau_e3
        |FROM nn JOIN cd ON cd.lang = nn.lang
        |JOIN tx ON tx.lang = nn.lang JOIN ty ON ty.lang = nn.lang"""
        .stripMargin),
      "Corpus-exact Kendall tau-b per language — every document pair, " +
        "not a bounded sample: the corpus compacts to its joint (x, y) " +
        "value histogram (cells bounded by the VALUE domain, not row " +
        "count), cell pairs classify concordant/discordant weighted by " +
        "cnt_a*cnt_b, and the tie corrections come from the 1-D " +
        "marginals alone (sum C(m,2)) so the pair join never handles " +
        "ties.  All integer until the 5-op IEEE tau tail (mirrored " +
        "exactly).  Complements kendall_tau_length (the " +
        "reference-shaped 100-doc sample): same statistic, the shape " +
        "that survives when n is 1e11 but the value grid is small — " +
        "and when the grid itself is large, quantize first, same " +
        "pipeline."),

    QueryDef(
      "knn_graph_nn_descent",
      (s, d) => {
        // NN-DESCENT (Dong et al. 2011): build the kNN graph WITHOUT
        // the O(n^2) all-pairs scoring that knn_graph's reference
        // construction uses — start from a deterministic seed
        // neighbor list and iteratively refine with the local-join
        // principle ("a neighbor of a neighbor is likely a
        // neighbor"): candidates = current edges + neighbor-of-
        // neighbor joins (FORWARD a->b->c and REVERSE siblings b<-a,
        // b<-c share a), re-score, keep top-k.  Per round that is
        // O(n * k^2) candidate pairs through plain equi-joins — the
        // construction that scales to corpus-sized graphs, vs the
        // quadratic brute force bounded to 300 vectors here.  Four
        // unrolled rounds at k=5 (measured on this fixture: exact-
        // top-3 edge recall climbs 11 -> 109 -> 252 -> 367 -> 465 of
        // 900, monotone every round); AnnRecallSpec pins the
        // convergence.  Construction shared with ann_graph_hier_topk
        // via nnDescentEdges / nnDescentSqlCtes.
        val e = Tables.embeddings(s, d).filter(col("vec_id") < 300)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        val g = nnDescentEdges(s, d)
        g.join(e.select(col("cid").as("src"), col("ce").as("se")), "src")
          .join(e.select(col("cid").as("dst"), col("ce").as("de")), "dst")
          .select(col("src"), col("dst"),
            floor(cosine(col("se"), col("de")) * 1000000).cast("bigint")
              .as("cos_e6"))
      },
      Some(s"""WITH $nnDescentSqlCtes
           |SELECT g4.src, g4.dst,
           |  floor(${cosineSql("es.embedding", "ed.embedding")}
           |        * 1000000)::BIGINT AS cos_e6
           |FROM g4 JOIN base es ON es.vec_id = g4.src
           |JOIN base ed ON ed.vec_id = g4.dst""".stripMargin),
      "NN-descent kNN-graph construction (Dong et al. 2011): start " +
        "from similarity-blind id-arithmetic seed neighbors and refine " +
        "with the local-join principle — candidates are the current " +
        "edges plus forward (a->b->c) and reverse (siblings sharing a " +
        "neighbor) neighbor-of-neighbor pairs, re-scored and pruned to " +
        "top-5 per node, four unrolled rounds.  O(n*k^2) equi-join " +
        "candidates per round vs the O(n^2) brute-force build the " +
        "bounded knn_graph reference uses — THE standard scalable " +
        "construction for the graph ann_graph_topk searches.  " +
        "Measured on this fixture the exact-top-3 edge recall climbs " +
        "11 -> 109 -> 252 -> 367 -> 465 of 900, monotone every round " +
        "(AnnRecallSpec pins it); all scoring on the bit-parity " +
        "cosine kernel, (cos DESC, dst) tie-breaks."),

    QueryDef(
      "ann_graph_hier_topk",
      (s, d) => {
        // The END-TO-END scalable graph-ANN pipeline — the HNSW story
        // assembled from the pieces this engine already proves out:
        //   build:  NN-descent graph (nnDescentEdges — O(n*k^2)/round)
        //   entry:  coarse quantizer routing (the IVF centroid grid) —
        //           each query enters at its 2 nearest centroids that
        //           are graph nodes, replacing ann_graph_topk's FIXED
        //           entry points (HNSW's upper layers are exactly this:
        //           a cheap structure that picks good entry points)
        //   search: the same bounded beam expansion (beam 8, 3 rounds)
        // No stage touches n^2 anything; per-query work stays
        // beam*degree*rounds regardless of corpus size.
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        // hierAdjacency reads the WRITTEN index (a parquet scan — see
        // nnDescentEdges' scaladoc for why the build must checkpoint),
        // so each beam round's reference to the adjacency is a cheap
        // re-scan; the persist() caches the symmetrized+deduped
        // adjacency across the three search rounds (QueryDef cache
        // contract; CacheContractSpec covers this query).
        hierBeamSearch(q, hierCorpus(s, d), hierAdjacency(s, d).persist())
      },
      Some {
        s"""WITH $nnDescentSqlCtes,
           |und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
           |    SELECT src, dst FROM g4
           |    UNION ALL SELECT dst, src FROM g4)),
           |e AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce
           |      FROM base),
           |q AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qe
           |      FROM embeddings WHERE vec_id < 10),
           |$annEntriesSql,
           |${annB0Sql("entries")},
           |$annRoundsSql
           |${annFinalSql(3)}""".stripMargin
      },
      "The assembled scalable graph-ANN pipeline (the HNSW story end " +
        "to end): NN-descent BUILDS the graph (O(n*k^2)/round local " +
        "joins), the IVF centroid grid ROUTES each query to its 2 " +
        "nearest centroids as entry points (what HNSW's upper layers " +
        "are for, replacing ann_graph_topk's fixed entries), and the " +
        "bounded beam search (beam 8, 3 rounds) finds the top-3 — no " +
        "stage is quadratic in corpus size and per-query work is a " +
        "constant.  Deterministic (cos DESC, cid) tie-breaks, " +
        "bit-parity cosine kernel; recall measured against brute " +
        "force in AnnRecallSpec alongside the fixed-entry variant."),

    QueryDef(
      "ann_index_insert",
      (s, d) => {
        // INDEX MAINTENANCE — the lifecycle piece after build and
        // serve: insert 20 new vectors (vec_id 300-319, outside the
        // indexed slice) into the WRITTEN graph without rebuilding.
        // Exactly the HNSW insertion procedure: (1) route the new
        // vector to entry points via the coarse-centroid grid, (2) run
        // the same bounded beam search the serving path uses to find
        // its k=5 nearest indexed nodes — these become its forward
        // edges — and (3) for each linked node, the back-edge PRUNE
        // decision: the new vector displaces the node's current worst
        // out-edge iff it scores strictly better (ties keep the
        // incumbent; compared on the shared e6 integer grid so both
        // engines decide identically). Per insert the work is the
        // search's beam*degree*rounds constant plus a k-row join — no
        // rebuild, no corpus scan. The displaced-edge min is a plain
        // partial-aggregated groupBy over the k-bounded edge list.
        val e = hierCorpus(s, d)
        val newV = Tables.embeddings(s, d)
          .filter(col("vec_id") >= 300 && col("vec_id") < 320)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        insertEdges(newV, e, hierAdjacency(s, d).persist(),
          worstEdges(s, d))
      },
      Some {
        s"""WITH $nnDescentSqlCtes,
           |$insertFwdSqlCtes,
           |w AS (SELECT g4.src,
           |    floor(min(${cosineSql("es.embedding", "ed.embedding")})
           |          * 1000000)::BIGINT AS displaced_e6
           |  FROM g4 JOIN base es ON es.vec_id = g4.src
           |  JOIN base ed ON ed.vec_id = g4.dst
           |  GROUP BY g4.src)
           |SELECT f.qid AS new_id, f.cid AS dst, f.rank, f.score_e6,
           |  w.displaced_e6, f.score_e6 > w.displaced_e6 AS back_inserted
           |FROM fwd f JOIN w ON w.src = f.cid""".stripMargin
      },
      "Graph-ANN index maintenance — HNSW-style INSERT into the " +
        "written index without a rebuild: route each of 20 new vectors " +
        "through the coarse-centroid grid, find its k=5 nearest indexed " +
        "nodes with the same bounded beam search serving uses (these " +
        "become its forward edges), and decide each back-edge by the " +
        "displacement rule — the new vector enters a linked node's " +
        "neighbor list iff it strictly beats that node's current worst " +
        "edge on the shared e6 integer grid (ties keep the incumbent). " +
        "Per insert: constant search work + a k-row join; the worst-" +
        "edge table is one partial-aggregated groupBy over the " +
        "k-bounded edge list. Completes the lifecycle the family " +
        "demonstrates: NN-descent BUILD -> written index -> routed " +
        "SEARCH/SERVE -> incremental INSERT."),

    QueryDef(
      "ann_index_consolidate",
      (s, d) => {
        // CONSOLIDATION — the periodic batch job the delta-insert
        // design defers to (see Streams.insertAnn's scaladoc): fold
        // the accumulated insert deltas into the index with ONE
        // NN-descent refinement round over base + inserted nodes.
        // Seed graph = the written base index + the WRITTEN delta
        // edges (materializedOnce — deltas are a table, exactly what
        // the streaming insert path lands); candidates = seeds +
        // forward/reverse neighbor-of-neighbor pairs; re-score and
        // keep top-5 per node over the widened corpus. This is the
        // step that lets INSERTED NODES LINK EACH OTHER (two new
        // vectors sharing a base neighbor meet through the reverse
        // join) — the edge class per-batch deltas cannot produce.
        // Same O(n*k^2) equi-join round as the build; nothing
        // quadratic, nothing rebuilt from scratch.
        val e320 = Tables.embeddings(s, d).filter(col("vec_id") < 320)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        val ins = materializedOnce(s, d, "insdelta") {
          val newV = Tables.embeddings(s, d)
            .filter(col("vec_id") >= 300 && col("vec_id") < 320)
            .select(col("vec_id").as("qid"), col("embedding").as("qe"))
          insertEdges(newV, hierCorpus(s, d),
            hierAdjacency(s, d).persist(), worstEdges(s, d))
            .select(col("new_id").as("src"), col("dst"))
        }
        val seed = nnDescentEdges(s, d).unionByName(ins)
        val fwd = seed.as("a").join(seed.as("b"),
            col("a.dst") === col("b.src"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
        val rev = seed.as("a").join(seed.as("b"),
            col("a.dst") === col("b.dst"))
          .select(col("a.src").as("src"), col("b.src").as("dst"))
        seed.unionByName(fwd).unionByName(rev)
          .distinct()
          .filter(col("src") =!= col("dst"))
          .join(e320.select(col("cid").as("src"), col("ce").as("se")),
            "src")
          .join(e320.select(col("cid").as("dst"), col("ce").as("de")),
            "dst")
          .select(col("src"), col("dst"),
            cosine(col("se"), col("de")).as("cos"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("src"))
              .orderBy(col("cos").desc, col("dst"))))
          .filter(col("rnk") <= 5)
          .select(col("src"), col("dst"),
            floor(col("cos") * 1000000).cast("bigint").as("cos_e6"))
      },
      Some(s"""WITH $nnDescentSqlCtes,
           |$insertFwdSqlCtes,
           |base320 AS MATERIALIZED (SELECT vec_id, embedding
           |  FROM embeddings WHERE vec_id < 320),
           |seed2 AS MATERIALIZED (SELECT src, dst FROM g4
           |  UNION ALL SELECT qid, cid FROM fwd),
           |cons AS (SELECT src, dst FROM seed2
           |  UNION ALL SELECT a.src, b.dst FROM seed2 a
           |    JOIN seed2 b ON a.dst = b.src
           |  UNION ALL SELECT a.src, b.src FROM seed2 a
           |    JOIN seed2 b ON a.dst = b.dst),
           |scored_k AS (SELECT c.src, c.dst,
           |    ${cosineSql("es.embedding", "ed.embedding")} AS cos
           |  FROM (SELECT DISTINCT src, dst FROM cons
           |        WHERE src <> dst) c
           |  JOIN base320 es ON es.vec_id = c.src
           |  JOIN base320 ed ON ed.vec_id = c.dst)
           |SELECT src, dst, floor(cos * 1000000)::BIGINT AS cos_e6
           |FROM (SELECT src, dst, cos, row_number() OVER (
           |    PARTITION BY src ORDER BY cos DESC, dst) AS rnk
           |  FROM scored_k)
           |WHERE rnk <= 5""".stripMargin),
      "Graph-ANN index CONSOLIDATION — the periodic batch job the " +
        "delta-insert design defers to: seed with the written base " +
        "index plus the written insert deltas and run one NN-descent " +
        "refinement round (seeds + forward/reverse neighbor-of-" +
        "neighbor candidates, re-scored, top-5 per node) over the " +
        "widened corpus. This is where inserted nodes gain edges to " +
        "EACH OTHER — the edge class per-batch deltas cannot " +
        "produce — at the build's O(n*k^2) equi-join cost, never a " +
        "rebuild. Closes the maintenance loop: build -> insert " +
        "deltas -> consolidate -> serve the refreshed table."),

    QueryDef(
      "ann_index_delete",
      (s, d) => {
        // The DELETE half of index maintenance: remove the 6 nodes
        // vec_id % 50 == 3 from the written graph and REPAIR the
        // survivors that pointed at them — the standard graph-index
        // repair (a deleted node's own out-neighbors are the best
        // replacement candidates for every edge that died pointing at
        // it, the same neighbor-of-neighbor principle NN-descent
        // builds with). Each affected survivor re-ranks those
        // candidates (minus deleted nodes, itself, and dsts it already
        // keeps) by the kernel cosine and refills exactly the edges it
        // lost. Work is bounded by |affected| x (dead dsts x k)
        // candidates — never a rebuild, never a corpus scan; the
        // per-src window ranks <= 25 candidate rows.
        val e = hierCorpus(s, d)
        val del = e.filter(pmod(col("cid"), lit(50)) === 3)
          .select(col("cid").as("del"))
        deleteRepair(del, del, nnDescentEdges(s, d), e)
      },
      Some(s"""WITH $nnDescentSqlCtes,
           |del AS (SELECT vec_id AS del FROM base WHERE vec_id % 50 = 3),
           |live AS (SELECT src, dst FROM g4
           |         WHERE src NOT IN (SELECT del FROM del)),
           |surv AS (SELECT src, dst FROM live
           |         WHERE dst NOT IN (SELECT del FROM del)),
           |dead AS (SELECT src, dst AS del FROM live
           |         WHERE dst IN (SELECT del FROM del)),
           |lost AS (SELECT src, count(*)::BIGINT AS n_lost
           |         FROM dead GROUP BY src),
           |cand AS (SELECT DISTINCT d.src, g.dst AS cand
           |  FROM dead d JOIN g4 g ON g.src = d.del
           |  WHERE g.dst <> d.src
           |    AND g.dst NOT IN (SELECT del FROM del)
           |    AND NOT EXISTS (SELECT 1 FROM surv s
           |                    WHERE s.src = d.src AND s.dst = g.dst)),
           |scored AS (SELECT c.src, c.cand,
           |    ${cosineSql("es.embedding", "ed.embedding")} AS cos
           |  FROM cand c JOIN base es ON es.vec_id = c.src
           |  JOIN base ed ON ed.vec_id = c.cand)
           |SELECT s.src, s.cand AS new_dst, rnk::BIGINT AS fill_rank,
           |  floor(cos * 1000000)::BIGINT AS cos_e6, l.n_lost
           |FROM (SELECT src, cand, cos, row_number() OVER (
           |    PARTITION BY src ORDER BY cos DESC, cand) AS rnk
           |  FROM scored) s
           |JOIN lost l ON l.src = s.src
           |WHERE rnk <= l.n_lost""".stripMargin),
      "Graph-ANN index maintenance, the DELETE half: drop 6 indexed " +
        "nodes and repair every survivor that pointed at one — the " +
        "deleted node's own out-neighbors are the replacement " +
        "candidates (the NN-descent neighbor-of-neighbor principle), " +
        "re-ranked by the kernel cosine minus deleted nodes, self, and " +
        "already-kept dsts, refilling exactly the lost edge count. " +
        "Candidate work is |affected| x (dead dsts x k) rows through " +
        "equi-joins and anti-joins; no rebuild, no corpus scan. " +
        "With ann_index_insert this closes the maintenance pair on " +
        "the written index."),
  )
}
