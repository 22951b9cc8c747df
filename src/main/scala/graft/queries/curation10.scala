package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 4: sequence alignment and distribution
  * drift — the biodata-native local-similarity kernel and the corpus
  * monitoring gate that watches re-ingestion runs.
  */
object Curation10Queries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ Smith-Waterman
    QueryDef(
      "smith_waterman_pairs",
      (s, d) => Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id").as("pid"),
          col("text").as("ta"),
          expr("substring(text, 1, (length(text)*9) div 10)").as("tb"))
        .select(col("pid"),
          graft.functions.SwKernel.smithWaterman(col("ta"), col("tb"))
            .as("sw_score"),
          size(split(col("tb"), " ")).cast("bigint").as("lb")),
      Some("""WITH RECURSIVE pairs AS (
        |  SELECT doc_id AS pid,
        |         string_split(text, ' ') AS ta,
        |         string_split(substr(text, 1, (length(text)*9)//10), ' ')
        |           AS tb,
        |         len(string_split(text, ' '))::BIGINT AS la,
        |         len(string_split(substr(text, 1, (length(text)*9)//10),
        |             ' '))::BIGINT AS lb
        |  FROM documents WHERE doc_id % 50 = 0),
        |dp AS (
        |  SELECT pid, la, lb, ta, tb, 1::BIGINT AS k,
        |         CAST([0] AS BIGINT[]) AS prev,
        |         CAST([0, 0] AS BIGINT[]) AS cur,
        |         0::BIGINT AS best
        |  FROM pairs
        |  UNION ALL
        |  SELECT pid, la, lb, ta, tb, k + 1, cur,
        |    list_transform(
        |      generate_series(greatest(0, k + 1 - lb), least(la, k + 1)),
        |      i -> CASE
        |        WHEN i = 0 OR k + 1 - i = 0 THEN 0::BIGINT
        |        ELSE greatest(0::BIGINT,
        |          prev[(i - greatest(0, k - 1 - lb))::INT]
        |            + (CASE WHEN ta[i::INT] = tb[(k + 1 - i)::INT]
        |                    THEN 2 ELSE -1 END),
        |          cur[(i - greatest(0, k - lb))::INT] - 1,
        |          cur[(i + 1 - greatest(0, k - lb))::INT] - 1) END)
        |      AS ncur,
        |    greatest(best, coalesce(list_max(
        |      list_transform(
        |        generate_series(greatest(0, k + 1 - lb), least(la, k + 1)),
        |        i -> CASE
        |          WHEN i = 0 OR k + 1 - i = 0 THEN 0::BIGINT
        |          ELSE greatest(0::BIGINT,
        |            prev[(i - greatest(0, k - 1 - lb))::INT]
        |              + (CASE WHEN ta[i::INT] = tb[(k + 1 - i)::INT]
        |                      THEN 2 ELSE -1 END),
        |            cur[(i - greatest(0, k - lb))::INT] - 1,
        |            cur[(i + 1 - greatest(0, k - lb))::INT] - 1) END)),
        |      0)) AS best
        |  FROM dp WHERE k < la + lb)
        |SELECT pid, best AS sw_score, lb
        |FROM dp WHERE k = la + lb""".stripMargin),
      "Smith-Waterman local alignment (match +2, mismatch -1, gap -1) " +
        "between each %50 document and its 90%-prefix truncation — the " +
        "biodata-native homology kernel (genome-record domain, " +
        "generate_narratives_from_data.py:79-85) over tokens, via the " +
        "native smith_waterman codegen kernel. The oracle replays the " +
        "SAME DP as the recursive-CTE anti-diagonal wavefront with a " +
        "running best column, so the max-over-matrix is hash-compared. " +
        "Row-local, zero shuffle; quadratic cost bounded by fixture " +
        "token caps (FixtureBoundsSpec)."),

    // ------------------------------------------------ histogram drift
    QueryDef(
      "histogram_drift_l1",
      (s, d) => {
        val v1 = Tables.documents(s, d)
          .select(expr("(length(text) div 50)").cast("bigint").as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as("n1"))
        // simulated re-ingested snapshot: same construction as
        // snapshot_diff (%7 deleted, %11 edited +3 chars, %13 re-added)
        val v2base = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(when(pmod(col("doc_id"), lit(11)) === 0,
            length(col("text")) + 3).otherwise(length(col("text")))
            .as("len"))
        val v2 = v2base.unionByName(
          Tables.documents(s, d).filter(pmod(col("doc_id"), lit(13)) === 0)
            .select(length(col("text")).as("len")))
          .select(expr("(len div 50)").cast("bigint").as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as("n2"))
        val joined = v1.join(v2, Seq("b"), "full_outer")
          .select(coalesce(col("n1"), lit(0L)).as("n1"),
            coalesce(col("n2"), lit(0L)).as("n2"))
        val totals = joined.agg(sum(col("n1")).as("nt1"),
          sum(col("n2")).as("nt2"))
        joined.crossJoin(broadcast(totals))
          .agg(max(col("nt1")).as("nt1"), max(col("nt2")).as("nt2"),
            sum(abs(col("n1") * col("nt2") - col("n2") * col("nt1")))
              .as("sad"))
          .select(col("nt1"), col("nt2"),
            expr("(1000 * sad) div (2 * nt1 * nt2)").as("tv_permille"))
      },
      Some("""WITH v1 AS (
        |  SELECT (length(text) // 50)::BIGINT AS b, count(*)::BIGINT AS n1
        |  FROM documents GROUP BY 1),
        |v2 AS (
        |  SELECT b, count(*)::BIGINT AS n2 FROM (
        |    SELECT ((CASE WHEN doc_id % 11 = 0 THEN length(text) + 3
        |                  ELSE length(text) END) // 50)::BIGINT AS b
        |    FROM documents WHERE doc_id % 7 <> 0
        |    UNION ALL
        |    SELECT (length(text) // 50)::BIGINT FROM documents
        |    WHERE doc_id % 13 = 0) GROUP BY b),
        |j AS (SELECT coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2
        |      FROM v1 FULL OUTER JOIN v2 USING (b)),
        |tot AS (SELECT sum(n1)::BIGINT AS nt1, sum(n2)::BIGINT AS nt2
        |        FROM j),
        |sad AS (SELECT sum(abs(n1 * nt2 - n2 * nt1))::BIGINT AS sad
        |        FROM j, tot)
        |SELECT nt1, nt2, (1000 * sad) // (2 * nt1 * nt2) AS tv_permille
        |FROM tot, sad""".stripMargin),
      "Total-variation distance (permille) between the doc-length " +
        "histograms of two corpus snapshots (same v2 construction as " +
        "snapshot_diff) — the drift gate a pipeline runs after every " +
        "re-ingestion: TV = (1/2) sum |p_i - q_i|, cross-multiplied to " +
        "integers so no normalization float ever exists. Histogram " +
        "state is bucket-bounded; the two scans are the only corpus " +
        "passes. Alarm threshold (e.g. > 50 permille) pages before a " +
        "skewed crawl contaminates training."),
  )
}
