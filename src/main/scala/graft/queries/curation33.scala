package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import Vector2Queries.{assign, assignSql, quant, quantSql, update}

/** Batch 27: vector-index engineering audits — scalar-quantization
  * distortion, IVF probe cost planning, clustering stability, and
  * residual energy accounting.  These are the measurements that decide
  * an ANN deployment's (quantizer, nlist, nprobe) before the 100 TB
  * index build; all arithmetic stays in exact integers on the e6-
  * quantized embedding substrate shared with the k-means family.
  */
object Curation33Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------- SQ8 quantization distortion
    QueryDef(
      "quantization_error_audit",
      (s, d) => {
        val dims = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            posexplode(quant(col("embedding"))).as(Seq("dim", "x")))
        val bounds = dims.groupBy(col("dim"))
          .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
          .select(col("dim"), col("lo"), (col("hi") - col("lo")).as("span"))
        val err = dims.join(broadcast(bounds), Seq("dim"))
          .select(col("vec_id"), col("label"),
            when(col("span") === 0, 0L).otherwise(
              abs(lit(255L) * (col("x") - col("lo")) -
                expr("(255 * (x - lo)) div span") * col("span")))
              .as("e255"))
        err.groupBy(col("vec_id"), col("label"))
          .agg(sum(col("e255")).as("distortion"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vectors"),
            expr("sum(distortion) div count(1)").as("avg_distortion"),
            max(col("distortion")).as("max_distortion"))
      },
      Some(s"""WITH dims AS (SELECT vec_id, label, dd.dd AS dim,
        |    ${quantSql.format("embedding")}[dd.dd + 1] AS x
        |  FROM embeddings, (SELECT range AS dd FROM range(0, 64)) dd),
        |bounds AS (SELECT dim, min(x) AS lo, (max(x) - min(x)) AS span
        |           FROM dims GROUP BY dim),
        |err AS (SELECT vec_id, label,
        |    CASE WHEN span = 0 THEN 0
        |         ELSE abs(255 * (x - lo)
        |              - ((255 * (x - lo)) // span) * span)
        |         END::BIGINT AS e255
        |  FROM dims JOIN bounds USING (dim)),
        |pv AS (SELECT vec_id, label, sum(e255)::BIGINT AS distortion
        |       FROM err GROUP BY 1, 2)
        |SELECT label, count(*)::BIGINT AS n_vectors,
        |  (sum(distortion) // count(*))::BIGINT AS avg_distortion,
        |  max(distortion)::BIGINT AS max_distortion
        |FROM pv GROUP BY label""".stripMargin),
      "Scalar-quantization (SQ8) distortion audit in exact integer " +
        "arithmetic: per dimension the corpus min/span define the " +
        "8-bit grid; the per-value error is measured in (e6 x 255) " +
        "units as |255(x-lo) - q*span| — the numerator of the true " +
        "rounding error, exact in int64 — then summed per vector and " +
        "profiled per label.  Labels whose max distortion spikes are " +
        "the clusters SQ8 would mis-rank and PQ-with-residuals should " +
        "own; the audit is two narrow aggs over the dim-exploded scan."),

    // ------------------------------------------ IVF probe cost curve
    QueryDef(
      "ann_probe_cost_curve",
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), quant(col("embedding")).as("qe"))
        val c0 = q.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("qe").as("cvec"))
        val sizes = assign(q, update(assign(q, c0)))
          .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
        val ranked = sizes
          .withColumn("rk", row_number().over(
            Window.orderBy(col("sz").desc, col("cluster"))).cast("long"))
          .withColumn("worst_rows", sum(col("sz")).over(
            Window.orderBy(col("sz").desc, col("cluster"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val tot = sizes.agg(sum(col("sz")).as("n_total"))
        ranked.crossJoin(broadcast(tot))
          .select(col("rk").as("nprobe"), col("worst_rows"),
            expr("(rk * n_total) div 8").as("avg_rows"),
            expr("(1000 * worst_rows) div ((rk * n_total) div 8)")
              .as("worst_vs_avg_permille"))
      },
      Some(s"""WITH q AS (SELECT vec_id,
        |    ${quantSql.format("embedding")} AS qe FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, qe AS cvec FROM q WHERE vec_id < 8),
        |a1 AS (${assignSql("q", "c0")}),
        |upd AS (SELECT cluster, dd.dd AS d,
        |    sum(qe[dd.dd + 1])::BIGINT AS sv, count(*)::BIGINT AS n
        |  FROM a1, (SELECT range AS dd FROM range(0, 64)) dd
        |  GROUP BY cluster, dd.dd),
        |c1 AS (SELECT cluster AS cid, list(sv // n ORDER BY d) AS cvec
        |  FROM upd GROUP BY cluster),
        |a2 AS (${assignSql("q", "c1")}),
        |sizes AS (SELECT cluster, count(*)::BIGINT AS sz
        |          FROM a2 GROUP BY cluster),
        |tot AS (SELECT sum(sz)::BIGINT AS n_total FROM sizes),
        |ranked AS (SELECT sz,
        |    row_number() OVER (ORDER BY sz DESC, cluster)::BIGINT AS rk,
        |    sum(sz) OVER (ORDER BY sz DESC, cluster
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS worst_rows
        |  FROM sizes)
        |SELECT rk AS nprobe, worst_rows,
        |  ((rk * n_total) // 8)::BIGINT AS avg_rows,
        |  ((1000 * worst_rows) // ((rk * n_total) // 8))::BIGINT
        |    AS worst_vs_avg_permille
        |FROM ranked, tot""".stripMargin),
      "IVF probe-cost planning curve: with the Lloyd coarse clusters as " +
        "inverted lists, the rows an nprobe-k query scans in the WORST " +
        "case (adversarial query near the k largest lists, cumulative " +
        "top-k sizes) versus the uniform expectation (k/nlist of the " +
        "corpus).  worst_vs_avg > ~2000 permille says the clustering " +
        "is skewed enough that nprobe tuning will miss latency SLOs — " +
        "re-cluster or split hot lists before building the 100 TB " +
        "index, not after."),

    // -------------------------------------- clustering stability
    QueryDef(
      "kmeans_assignment_stability",
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), quant(col("embedding")).as("qe"))
        def run(initLo: Long, initHi: Long) = {
          val c0 = q.filter(col("vec_id") >= initLo &&
            col("vec_id") < initHi)
            .select(col("vec_id").as("cid"), col("qe").as("cvec"))
          assign(q, update(assign(q, c0)))
            .select(col("vec_id"), col("cluster"))
        }
        val a = run(0, 8).select(col("vec_id"), col("cluster").as("ca"))
          .filter(col("vec_id") < 100)
        val b = run(8, 16).select(col("vec_id"), col("cluster").as("cb"))
          .filter(col("vec_id") < 100)
        val lab = a.join(b, Seq("vec_id"))
        val pairs = lab.as("x")
          .join(broadcast(lab.as("y")), col("x.vec_id") < col("y.vec_id"))
          .select(
            (col("x.ca") === col("y.ca")).cast("long").as("sa"),
            (col("x.cb") === col("y.cb")).cast("long").as("sb"))
        pairs.agg(count(lit(1)).as("n_pairs"),
          sum(when(col("sa") === 1 && col("sb") === 1, 1L).otherwise(0L))
            .as("n11"),
          sum(when(col("sa") === 0 && col("sb") === 0, 1L).otherwise(0L))
            .as("n00"))
          .withColumn("rand_index_permille",
            expr("(1000 * (n11 + n00)) div n_pairs"))
      },
      Some(s"""WITH q AS (SELECT vec_id,
        |    ${quantSql.format("embedding")} AS qe FROM embeddings),
        |c0a AS (SELECT vec_id AS cid, qe AS cvec FROM q WHERE vec_id < 8),
        |a1a AS (${assignSql("q", "c0a")}),
        |upda AS (SELECT cluster, dd.dd AS d,
        |    sum(qe[dd.dd + 1])::BIGINT AS sv, count(*)::BIGINT AS n
        |  FROM a1a, (SELECT range AS dd FROM range(0, 64)) dd
        |  GROUP BY cluster, dd.dd),
        |c1a AS (SELECT cluster AS cid, list(sv // n ORDER BY d) AS cvec
        |  FROM upda GROUP BY cluster),
        |a2a AS (${assignSql("q", "c1a")}),
        |c0b AS (SELECT vec_id AS cid, qe AS cvec FROM q
        |        WHERE vec_id >= 8 AND vec_id < 16),
        |a1b AS (${assignSql("q", "c0b")}),
        |updb AS (SELECT cluster, dd.dd AS d,
        |    sum(qe[dd.dd + 1])::BIGINT AS sv, count(*)::BIGINT AS n
        |  FROM a1b, (SELECT range AS dd FROM range(0, 64)) dd
        |  GROUP BY cluster, dd.dd),
        |c1b AS (SELECT cluster AS cid, list(sv // n ORDER BY d) AS cvec
        |  FROM updb GROUP BY cluster),
        |a2b AS (${assignSql("q", "c1b")}),
        |lab AS (SELECT a.vec_id, a.cluster AS ca, b.cluster AS cb
        |  FROM a2a a JOIN a2b b ON b.vec_id = a.vec_id
        |  WHERE a.vec_id < 100),
        |pairs AS (SELECT
        |    CASE WHEN x.ca = y.ca THEN 1 ELSE 0 END AS sa,
        |    CASE WHEN x.cb = y.cb THEN 1 ELSE 0 END AS sb
        |  FROM lab x JOIN lab y ON x.vec_id < y.vec_id)
        |SELECT count(*)::BIGINT AS n_pairs,
        |  sum(CASE WHEN sa = 1 AND sb = 1 THEN 1 ELSE 0 END)::BIGINT
        |    AS n11,
        |  sum(CASE WHEN sa = 0 AND sb = 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n00,
        |  ((1000 * (sum(CASE WHEN sa = 1 AND sb = 1 THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN sa = 0 AND sb = 0 THEN 1 ELSE 0 END)))
        |    // count(*))::BIGINT AS rand_index_permille
        |FROM pairs""".stripMargin),
      "Clustering stability via the Rand index: the same 2-pass Lloyd " +
        "run from two disjoint deterministic seeds, compared on all " +
        "pairs of a 100-vector panel — the fraction of pairs on whose " +
        "together/apart verdict both runs agree.  A low Rand index " +
        "means the IVF partition (and anything downstream: SemDeDup " +
        "pruning, per-cluster quotas) is an artifact of initialization, " +
        "not structure — re-seed or raise k before trusting it.  The " +
        "panel cap keeps the pair join O(1) regardless of corpus size."),

    // --------------------------------------- residual energy ratio
    QueryDef(
      "residual_vector_energy",
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), quant(col("embedding")).as("qe"))
        val c0 = q.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("qe").as("cvec"))
        val a2 = assign(q, update(assign(q, c0)))
        val raw = q.select(col("vec_id"),
          Vector2Queries.sqDist(col("qe"),
            expr("transform(qe, x -> 0L)")).as("raw_energy"))
        a2.join(raw, Seq("vec_id"))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_vectors"),
            expr("sum(dist) div count(1)").as("avg_residual"),
            expr("(1000 * sum(dist)) div sum(raw_energy)")
              .as("energy_ratio_permille"))
      },
      Some(s"""WITH q AS (SELECT vec_id,
        |    ${quantSql.format("embedding")} AS qe FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, qe AS cvec FROM q WHERE vec_id < 8),
        |a1 AS (${assignSql("q", "c0")}),
        |upd AS (SELECT cluster, dd.dd AS d,
        |    sum(qe[dd.dd + 1])::BIGINT AS sv, count(*)::BIGINT AS n
        |  FROM a1, (SELECT range AS dd FROM range(0, 64)) dd
        |  GROUP BY cluster, dd.dd),
        |c1 AS (SELECT cluster AS cid, list(sv // n ORDER BY d) AS cvec
        |  FROM upd GROUP BY cluster),
        |a2 AS (${assignSql("q", "c1")}),
        |raw AS (SELECT vec_id, ${Vector2Queries.sqDistSql("qe",
          "list_transform(qe, x -> 0::BIGINT)")} AS raw_energy FROM q)
        |SELECT cluster, count(*)::BIGINT AS n_vectors,
        |  (sum(dist) // count(*))::BIGINT AS avg_residual,
        |  ((1000 * sum(dist)) // sum(raw_energy))::BIGINT
        |    AS energy_ratio_permille
        |FROM a2 JOIN raw USING (vec_id) GROUP BY cluster""".stripMargin),
      "Residual energy accounting per coarse cluster: the squared " +
        "distance to the assigned centroid (the residual a PQ codebook " +
        "must encode) versus the raw vector energy, in permille.  " +
        "Ratios near 1000 mean the coarse quantizer explains nothing " +
        "and PQ-on-residuals will behave like PQ-on-raw; low ratios " +
        "justify the IVF-PQ layout (pq_encode) where codebooks train " +
        "on residuals.  Rides the same two Lloyd passes as the " +
        "probe-cost curve — the audits share the cluster build."),
  )
}
