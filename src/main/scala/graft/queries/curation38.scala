package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch 32: sampling sketches and physical-partitioning planners —
  * budget-constrained top-k, priority sampling with its unbiased
  * subset-sum estimator, equi-depth range boundaries, and a roaring-
  * style bitmap container cost model.  Each turns a cluster-planning
  * decision (what to keep, where to split, how to encode) into an
  * oracle-checked table.
  */
object Curation38Queries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------- budgeted per-source top-k
    QueryDef(
      "budgeted_topk_per_source",
      (s, d) => {
        val perSrc = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("src_rank", row_number().over(perSrc).cast("long"))
          .filter(col("src_rank") <= 5)
          .withColumn("global_rank", row_number().over(
            Window.orderBy(col("n_chars").desc, col("doc_id")))
            .cast("long"))
          .filter(col("global_rank") <= 50)
      },
      Some("""WITH ranked AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id)::BIGINT AS src_rank
        |  FROM documents),
        |capped AS (SELECT * FROM ranked WHERE src_rank <= 5)
        |SELECT doc_id, source, n_chars, src_rank,
        |  rn::BIGINT AS global_rank
        |FROM (SELECT *, row_number() OVER (ORDER BY n_chars DESC, doc_id)
        |        AS rn FROM capped)
        |WHERE rn <= 50""".stripMargin),
      "Budget-constrained selection: global top-50 by length subject to " +
        "a 5-per-source diversity cap — the mixture-aware 'best K " +
        "documents' every curated subset needs (a plain top-k would let " +
        "one verbose source take the whole budget).  Two WindowGroup" +
        "Limit-eligible rank windows: the per-source cap prunes to " +
        "5 x sources rows BEFORE anything global runs, so the global " +
        "stage is size-independent of the corpus."),

    // ------------------------------------ priority sampling estimator
    QueryDef(
      "priority_sample_estimator",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("w"),
            (conv(substring(md5(concat(lit("pri"),
              col("doc_id").cast("string"))), 1, 12), 16, 10)
              .cast("long") + 1L).as("u48"))
          // priority q = w / (u/2^48): one correctly-rounded IEEE
          // division per row; ORDER on doubles is engine-stable
          .withColumn("q", col("w").cast("double") /
            (col("u48").cast("double") / lit(2.81474976710656e14)))
        // Only the top 51 priorities matter, so plan a distributed top-k
        // (orderBy+limit => TakeOrderedAndProject: per-partition bounded
        // heaps + driver merge of 51*parts rows) instead of a global
        // row_number sort. The row_number below runs over the 51
        // surviving rows — bounded input, not the corpus.
        val top = docs.orderBy(col("q").desc, col("doc_id")).limit(51)
        val ranked = top.withColumn("rk", row_number().over(
          Window.orderBy(col("q").desc, col("doc_id"))).cast("long"))
        val tau = ranked.filter(col("rk") === 51)
          .select(floor(col("q") * 1e6).cast("long").as("tau_e6"))
        val sample = ranked.filter(col("rk") <= 50)
        val est = sample.crossJoin(broadcast(tau))
          .select(greatest(col("w") * 1000000L, col("tau_e6")).as("est_e6"))
          .agg(sum(col("est_e6")).as("est_sum_e6"), count(lit(1)).as("k"))
        val truth = docs.agg(sum(col("w")).as("true_total"))
        est.crossJoin(broadcast(truth))
          .select(col("k").as("n_sample"), col("true_total"),
            expr("est_sum_e6 div 1000000").as("estimate"),
            expr("""(1000 * abs(est_sum_e6 div 1000000 - true_total))
              | div true_total""".stripMargin).as("err_permille"))
      },
      Some("""WITH docs AS (SELECT doc_id,
        |    len(string_split(text, ' '))::BIGINT AS w,
        |    (('0x' || substr(md5('pri' || doc_id::VARCHAR), 1, 12))
        |      ::BIGINT + 1) AS u48
        |  FROM documents),
        |q AS (SELECT doc_id, w,
        |    w::DOUBLE / (u48::DOUBLE / 2.81474976710656e14) AS q
        |  FROM docs),
        |rk AS (SELECT *, row_number() OVER (ORDER BY q DESC, doc_id)
        |         ::BIGINT AS rk FROM q),
        |tau AS (SELECT floor(q * 1e6)::BIGINT AS tau_e6 FROM rk
        |        WHERE rk = 51),
        |est AS (SELECT count(*)::BIGINT AS k,
        |    sum(greatest(w * 1000000, tau_e6))::BIGINT AS est_sum_e6
        |  FROM rk, tau WHERE rk <= 50),
        |tr AS (SELECT sum(w)::BIGINT AS true_total FROM docs)
        |SELECT k AS n_sample, true_total,
        |  (est_sum_e6 // 1000000)::BIGINT AS estimate,
        |  ((1000 * abs(est_sum_e6 // 1000000 - true_total))
        |   // true_total)::BIGINT AS err_permille
        |FROM est, tr""".stripMargin),
      "Priority sampling (Duffield-Lund-Thorup): priority q = w/u with " +
        "a deterministic 48-bit hash uniform, keep the top-50, and " +
        "estimate the corpus token total as sum(max(w, tau)) with tau " +
        "the 51st priority — the near-optimal unbiased subset-sum " +
        "estimator.  The estimate accumulates in e6 INTEGERS (only the " +
        "per-row priority is a float, one correctly-rounded division), " +
        "so the result is reduce-order-independent.  This is how you " +
        "keep a 50-document pilot that still answers 'how many tokens " +
        "does the corpus have' within a few percent."),

    // ---------------------------------- range partition boundaries
    QueryDef(
      "range_partition_boundaries",
      (s, d) => {
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
        // global equi-depth rank via ScalableIndex — range partition +
        // per-partition offsets, no unpartitioned row_number window over
        // the corpus
        val ranked = graft.operators.ScalableIndex
          .withDenseIndex(
            Tables.documents(s, d).select(col("n_chars"), col("doc_id")),
            Seq(col("n_chars"), col("doc_id")), 8, "idx")
          .withColumn("rk", col("idx") + 1)
        ranked.crossJoin(broadcast(n))
          .withColumn("pid", expr("((rk - 1) * 16) div n"))
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
          .crossJoin(broadcast(n))
          .select(col("pid").as("partition_id"), col("n_rows"),
            col("lo"), col("hi"),
            expr("(1000 * n_rows * 16) div n").as("fill_permille"))
      },
      Some("""WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
        |rk AS (SELECT n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id)::BIGINT AS rk
        |  FROM documents),
        |p AS (SELECT ((rk - 1) * 16) // n.n AS pid, n_chars
        |      FROM rk, n)
        |SELECT pid AS partition_id, count(*)::BIGINT AS n_rows,
        |  min(n_chars)::BIGINT AS lo, max(n_chars)::BIGINT AS hi,
        |  ((1000 * count(*) * 16) // n.n)::BIGINT AS fill_permille
        |FROM p, n GROUP BY pid, n.n""".stripMargin),
      "Equi-depth range-partition planning: 16 rank-derived buckets " +
        "over the length key with per-partition bounds and fill " +
        "factors — exactly the boundary table repartitionByRange " +
        "samples for, computed exactly.  At 100 TB you compute this on " +
        "a sample, but the PLAN shape (rank -> bucket -> bounds) is " +
        "identical, and fill_permille far from 1000 is the skew " +
        "warning that says a hash salt or finer boundaries are needed " +
        "before the big sort-write."),

    // ------------------------------------- bitmap container model
    QueryDef(
      "bitmap_index_size_model",
      (s, d) => {
        val bits = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            expr("doc_id div 256").as("chunk"))
        val runFlag = bits
          .withColumn("prev", lag(col("doc_id"), 1).over(
            Window.partitionBy(col("source"), col("chunk"))
              .orderBy(col("doc_id"))))
          .withColumn("is_run_head",
            coalesce(col("prev") =!= col("doc_id") - 1, lit(true))
              .cast("long"))
        val chunks = runFlag.groupBy(col("source"), col("chunk"))
          .agg(count(lit(1)).as("n_bits"),
            sum(col("is_run_head")).as("n_runs"))
          .withColumn("array_bytes", col("n_bits") * 2L)
          .withColumn("bitmap_bytes", lit(32L))
          .withColumn("run_bytes", col("n_runs") * 4L)
          .withColumn("container",
            when(col("run_bytes") <= col("array_bytes") &&
              col("run_bytes") <= col("bitmap_bytes"), "run")
              .when(col("array_bytes") <= col("bitmap_bytes"), "array")
              .otherwise("bitmap"))
        chunks.groupBy(col("source"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("container") === "array", 1L).otherwise(0L))
              .as("n_array"),
            sum(when(col("container") === "bitmap", 1L).otherwise(0L))
              .as("n_bitmap"),
            sum(when(col("container") === "run", 1L).otherwise(0L))
              .as("n_run"),
            sum(least(col("array_bytes"),
              least(col("bitmap_bytes"), col("run_bytes"))))
              .as("est_bytes"))
      },
      Some("""WITH bits AS (SELECT source, doc_id,
        |    (doc_id // 256)::BIGINT AS chunk FROM documents),
        |rf AS (SELECT source, chunk, doc_id,
        |    CASE WHEN lag(doc_id) OVER (PARTITION BY source, chunk
        |           ORDER BY doc_id) = doc_id - 1 THEN 0 ELSE 1
        |      END::BIGINT AS is_run_head
        |  FROM bits),
        |ch AS (SELECT source, chunk, count(*)::BIGINT AS n_bits,
        |    sum(is_run_head)::BIGINT AS n_runs
        |  FROM rf GROUP BY 1, 2),
        |sz AS (SELECT source, chunk, n_bits * 2 AS array_bytes,
        |    32 AS bitmap_bytes, n_runs * 4 AS run_bytes
        |  FROM ch),
        |pick AS (SELECT source,
        |    CASE WHEN run_bytes <= array_bytes
        |          AND run_bytes <= bitmap_bytes THEN 'run'
        |         WHEN array_bytes <= bitmap_bytes THEN 'array'
        |         ELSE 'bitmap' END AS container,
        |    least(array_bytes, least(bitmap_bytes, run_bytes)) AS b
        |  FROM sz)
        |SELECT source, count(*)::BIGINT AS n_chunks,
        |  sum(CASE WHEN container = 'array' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_array,
        |  sum(CASE WHEN container = 'bitmap' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_bitmap,
        |  sum(CASE WHEN container = 'run' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_run,
        |  sum(b)::BIGINT AS est_bytes
        |FROM pick GROUP BY source""".stripMargin),
      "Roaring-bitmap container cost model for a source->doc_id " +
        "secondary index: per 256-id chunk, the exact cost of array " +
        "(2B/bit), bitmap (fixed 32B), and run-length (4B/run) " +
        "encodings, picking the cheapest — the container decision " +
        "Roaring makes per 2^16 block, scaled to the fixture's id " +
        "space.  Clustered id ranges collapse into run containers; " +
        "scattered ones stay arrays; the per-source byte totals are " +
        "the index-size forecast before building it."),
  )
}
