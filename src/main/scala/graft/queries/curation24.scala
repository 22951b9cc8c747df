package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Space-filling-curve layout keys shared by the batch-18 queries and
  * their specs: Hilbert (xy2d, 6 levels over a 64x64 grid) and Morton
  * (bit interleave) as pure integer Column expressions — the clustering
  * keys a 100 TB writer would repartitionByRange on before a sorted
  * parquet write.  The Hilbert fold applies the standard rotate-and-
  * accumulate recurrence (Wikipedia "Hilbert curve", public domain
  * pseudocode); each level is a separate projection so codegen sees a
  * linear chain instead of an exponentially duplicated expression tree.
  */
object LayoutKeys {
  val GridBits = 6
  val GridSide = 1 << GridBits // 64

  /** One Hilbert level: returns (x', y', d') as Columns from (x, y, d). */
  private def level(s: Long, x: Column, y: Column, d: Column)
      : (Column, Column, Column) = {
    val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
    val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
    val d2 = d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
    // rotate: if ry==0 { if rx==1 reflect; swap } — fused into one CASE
    val x2 = when(ry === 0, when(rx === 1, lit(s - 1) - y).otherwise(y))
      .otherwise(x)
    val y2 = when(ry === 0, when(rx === 1, lit(s - 1) - x).otherwise(x))
      .otherwise(y)
    (x2, y2, d2)
  }

  /** Hilbert distance of (x, y) on the 64x64 grid, materialized level by
    * level on `df` as intermediate columns (kept out of one giant
    * expression so CollapseProject cannot exponentiate the tree). */
  def withHilbert(df: DataFrame, x: Column, y: Column, out: String): DataFrame = {
    val lv = Seq(32L, 16L, 8L, 4L, 2L, 1L)
    val start = df.withColumn("_hx", x).withColumn("_hy", y)
      .withColumn(out, lit(0L))
    val folded = lv.foldLeft(start) { (acc, s) =>
      val (x2, y2, d2) = level(s, col("_hx"), col("_hy"), col(out))
      // new columns must be computed from the OLD ones atomically
      acc.withColumn("_nx", x2).withColumn("_ny", y2).withColumn("_nd", d2)
        .drop("_hx", "_hy", out)
        .withColumnRenamed("_nx", "_hx").withColumnRenamed("_ny", "_hy")
        .withColumnRenamed("_nd", out)
    }
    folded.drop("_hx", "_hy")
  }

  /** Morton (Z-order) code of (x, y), 6 bits per dimension. */
  def morton(x: Column, y: Column): Column =
    (0 until GridBits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** DuckDB mirror of [[morton]]. */
  def mortonSql(x: String, y: String): String =
    (0 until GridBits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + " +
        s"(($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** DuckDB mirror of the Hilbert fold: CTE chain hl0..hl6 carrying
    * (x, y, d) plus the caller's passthrough columns. */
  def hilbertLevelsSql(baseSelect: String, passthrough: String): String = {
    val keep = if (passthrough.isEmpty) "" else s"$passthrough, "
    val levels = Seq(32L, 16L, 8L, 4L, 2L, 1L).zipWithIndex.map {
      case (s, i) =>
        val prev = s"hl$i"
        val cur = s"hl${i + 1}"
        s"""$cur AS (SELECT $keep
           |  CASE WHEN (y & $s) = 0
           |       THEN (CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END)
           |       ELSE x END AS x,
           |  CASE WHEN (y & $s) = 0
           |       THEN (CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END)
           |       ELSE y END AS y,
           |  (d + ${s * s} * xor(CASE WHEN (x & $s) > 0 THEN 3 ELSE 0 END,
           |                      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END))::BIGINT AS d
           |FROM $prev)""".stripMargin
    }
    s"hl0 AS ($baseSelect),\n" + levels.mkString(",\n")
  }
}

/** Batch 18: physical-layout and placement planning — the storage-side
  * decisions (clustering key choice, per-column encoding, shard routing,
  * release anonymity) that dominate cost at 100 TB, each expressed as an
  * auditable query instead of folklore.
  */
object Curation24Queries {
  import LayoutKeys._

  // 48-bit md5-derived position — exact in both engines (fits a double
  // during Spark's conv(), exact hex parse in DuckDB).
  private def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")
  private def h48Sql(c: String): String =
    s"('0x' || substr(md5($c), 1, 12))::BIGINT"

  /** Consistent-hash assignment of docs to the first `nodes*8`-vnode ring
    * position at or after the doc's own position (wrapping to the ring
    * minimum). Returns (doc_id, node). */
  private def assign(s: SparkSession, docs: DataFrame, nodes: Int,
      out: String): DataFrame = {
    val vn = s.range(nodes * 8L).select(
      concat(lit("n"), expr("id div 8").cast("string")).as("node"),
      h48(concat(lit("vn"), col("id").cast("string"))).as("vh"))
    val chosen = docs.crossJoin(broadcast(vn))
      .groupBy(col("doc_id"), col("dh"))
      .agg(coalesce(min(when(col("vh") >= col("dh"), col("vh"))),
        min(col("vh"))).as("ch"))
    chosen.join(broadcast(vn), col("ch") === col("vh"))
      .groupBy(col("doc_id")).agg(min(col("node")).as(out))
  }

  private def assignSql(nodes: Int, a: String, n: String, out: String): String =
    s"""$a AS (SELECT doc_id,
       |  coalesce(min(CASE WHEN vh >= dh THEN vh END), min(vh)) AS ch
       |  FROM docs, vn WHERE vid < ${nodes * 8} GROUP BY doc_id),
       |$n AS (SELECT $a.doc_id, min(node) AS $out
       |  FROM $a JOIN vn ON vn.vh = $a.ch AND vn.vid < ${nodes * 8}
       |  GROUP BY 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------- Hilbert clustering
    QueryDef(
      "hilbert_cluster",
      (s, d) => {
        val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
          col("user_id").bitwiseAND(lit(63L)).as("hx"),
          pmod(col("event_id"), lit(64L)).as("hy"))
        withHilbert(e, col("hx"), col("hy"), "hkey")
          .select(col("event_id"), col("user_id"), col("hkey"),
            expr("hkey div 64").as("hbucket"))
      },
      Some(s"""WITH ${hilbertLevelsSql(
        """SELECT event_id, user_id,
          |  (user_id & 63)::BIGINT AS x, (event_id % 64)::BIGINT AS y,
          |  0::BIGINT AS d FROM events""".stripMargin,
        "event_id, user_id")}
        |SELECT event_id, user_id, d AS hkey, (d // 64)::BIGINT AS hbucket
        |FROM hl6""".stripMargin),
      "Hilbert-curve clustering key over two dimensions (user, event " +
        "slot), the locality-stronger sibling of zorder_cluster: unlike " +
        "Morton order, every unit step along the Hilbert key moves " +
        "exactly one cell in exactly one dimension, so key-contiguous " +
        "file blocks cover compact 2-D tiles with no diagonal jumps — " +
        "tighter per-file min/max bounds on BOTH columns and strictly " +
        "better stats-based pruning (measured by layout_locality_audit). " +
        "Six fused CASE/bit levels, all integer, all inside whole-stage " +
        "codegen; hbucket is the repartitionByRange file assignment."),

    // -------------------------------------------- layout locality audit
    QueryDef(
      "layout_locality_audit",
      (s, d) => {
        val e = Tables.events(s, d).select(
          col("user_id").bitwiseAND(lit(63L)).as("hx"),
          pmod(col("event_id"), lit(64L)).as("hy"))
        val keyed = withHilbert(e, col("hx"), col("hy"), "hkey")
          .withColumn("mkey", morton(col("hx"), col("hy")))
        val layouts = keyed
          .select(lit("hilbert").as("layout"),
            expr("hkey div 64").as("block"), col("hx"), col("hy"))
          .unionByName(keyed.select(lit("morton").as("layout"),
            expr("mkey div 64").as("block"), col("hx"), col("hy")))
        layouts.groupBy(col("layout"), col("block"))
          .agg(((max(col("hx")) - min(col("hx")) + lit(1L)) *
            (max(col("hy")) - min(col("hy")) + lit(1L))).as("area"))
          .groupBy(col("layout"))
          .agg(count(lit(1)).as("n_blocks"), sum(col("area")).as("sum_area"),
            max(col("area")).as("max_area"))
      },
      Some(s"""WITH ${hilbertLevelsSql(
        """SELECT event_id,
          |  (user_id & 63)::BIGINT AS x, (event_id % 64)::BIGINT AS y,
          |  (user_id & 63)::BIGINT AS hx, (event_id % 64)::BIGINT AS hy,
          |  0::BIGINT AS d FROM events""".stripMargin,
        "event_id, hx, hy")},
        |keyed AS (SELECT hx, hy, d AS hkey,
        |    (${mortonSql("hx", "hy")})::BIGINT AS mkey FROM hl6),
        |layouts AS (
        |  SELECT 'hilbert' AS layout, hkey // 64 AS block, hx, hy FROM keyed
        |  UNION ALL
        |  SELECT 'morton' AS layout, mkey // 64 AS block, hx, hy FROM keyed),
        |blocks AS (SELECT layout, block,
        |    (max(hx) - min(hx) + 1) * (max(hy) - min(hy) + 1) AS area
        |  FROM layouts GROUP BY 1, 2)
        |SELECT layout, count(*)::BIGINT AS n_blocks,
        |  sum(area)::BIGINT AS sum_area, max(area)::BIGINT AS max_area
        |FROM blocks GROUP BY 1""".stripMargin),
      "Quantified layout comparison: per 64-key file block, the bounding " +
        "box of the 2-D cells the block covers — the exact region a " +
        "min/max-stats pruner must assume the file might contain. " +
        "Hilbert's unit-step adjacency yields uniformly compact boxes; " +
        "Morton's diagonal discontinuities inflate them. sum_area is " +
        "directly proportional to expected false-positive file reads " +
        "under uniform point predicates, so this query turns the " +
        "clustering-key choice into a measured number rather than a " +
        "folklore preference."),

    // ---------------------------------------------- encoding size estimate
    QueryDef(
      "encoding_size_estimate",
      (s, d) => {
        val stacked = Tables.documents(s, d).selectExpr("doc_id",
          "stack(3, 'lang', lang, 'source', source, " +
            "'n_chars', cast(n_chars as string)) as (col_name, v)")
        // run-head detection WITHOUT a per-col_name window (3 enum
        // values -> corpus/3 rows per window task): ScalableGroups
        // ranks each row in its column's doc_id order via one range
        // exchange, and the predecessor comes back as an idx+1
        // equi-join on (col_name, rank) — the
        // blocking_sorted_neighborhood neighbor pattern, distributed
        // by the data-cardinality rank key
        val ranked = graft.operators.ScalableGroups.withGroupRank(
          stacked, Seq("col_name"), Seq(col("doc_id")), 8,
          rankCol = "grank")
        val prev = ranked.select(col("col_name"),
          (col("grank") + 1L).as("grank"), col("v").as("prev_v"))
        val withHead = ranked.join(prev, Seq("col_name", "grank"), "left")
          .withColumn("is_head",
            coalesce(col("prev_v") =!= col("v"), lit(true)))
        val base = withHead.groupBy(col("col_name")).agg(
          count(lit(1)).as("n_values"),
          sum(octet_length(col("v")).cast("long") * 8L).as("plain_bits"),
          sum(when(col("is_head"),
            octet_length(col("v")).cast("long") * 8L + 16L)
            .otherwise(0L)).as("rle_bits"),
          sum(when(col("is_head"), 1L).otherwise(0L)).as("n_runs"))
        val dist = stacked.select(col("col_name"), col("v")).distinct()
          .groupBy(col("col_name"))
          .agg(count(lit(1)).as("n_distinct"),
            sum(octet_length(col("v")).cast("long")).as("dist_octets"))
        base.join(dist, Seq("col_name"))
          .withColumn("code_bits", when(col("n_distinct") === 1, 0L)
            .otherwise(length(bin(col("n_distinct") - 1)).cast("long")))
          .withColumn("dict_bits",
            col("dist_octets") * 8L + col("n_values") * col("code_bits"))
          .select(col("col_name"), col("n_values"), col("n_distinct"),
            col("n_runs"), col("plain_bits"), col("dict_bits"),
            col("rle_bits"),
            when(col("dict_bits") <= col("plain_bits") &&
              col("dict_bits") <= col("rle_bits"), "dict")
              .when(col("rle_bits") <= col("plain_bits"), "rle")
              .otherwise("plain").as("best_encoding"))
      },
      Some("""WITH stacked AS (
        |  SELECT doc_id, 'lang' AS col_name, lang AS v FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'source', source FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'n_chars', n_chars::VARCHAR FROM documents),
        |heads AS (SELECT col_name, v,
        |    coalesce(lag(v) OVER (PARTITION BY col_name ORDER BY doc_id)
        |             <> v, TRUE) AS is_head
        |  FROM stacked),
        |base AS (SELECT col_name, count(*)::BIGINT AS n_values,
        |    sum(strlen(v) * 8)::BIGINT AS plain_bits,
        |    sum(CASE WHEN is_head THEN strlen(v) * 8 + 16 ELSE 0
        |        END)::BIGINT AS rle_bits,
        |    sum(CASE WHEN is_head THEN 1 ELSE 0 END)::BIGINT AS n_runs
        |  FROM heads GROUP BY 1),
        |dist AS (SELECT col_name, count(*)::BIGINT AS n_distinct,
        |    sum(strlen(v))::BIGINT AS dist_octets
        |  FROM (SELECT DISTINCT col_name, v FROM stacked) GROUP BY 1),
        |joined AS (SELECT base.*, n_distinct, dist_octets,
        |    CASE WHEN n_distinct = 1 THEN 0
        |         ELSE strlen(bin(n_distinct - 1)) END::BIGINT AS code_bits
        |  FROM base JOIN dist USING (col_name))
        |SELECT col_name, n_values, n_distinct, n_runs, plain_bits,
        |  (dist_octets * 8 + n_values * code_bits)::BIGINT AS dict_bits,
        |  rle_bits,
        |  CASE WHEN dist_octets * 8 + n_values * code_bits <= plain_bits
        |        AND dist_octets * 8 + n_values * code_bits <= rle_bits
        |       THEN 'dict'
        |       WHEN rle_bits <= plain_bits THEN 'rle'
        |       ELSE 'plain' END AS best_encoding
        |FROM joined""".stripMargin),
      "Per-column encoding cost model from one profiling pass: exact " +
        "plain size, dictionary size (distinct payload + ceil(log2 d) " +
        "bits per code), and RLE size (run heads + 16-bit run lengths), " +
        "with the winning encoding per column — the decision a columnar " +
        "writer makes per row group.  At 100 TB this is how you discover " +
        "that `source` wants dictionary while ingest-ordered `n_chars` " +
        "does not; the stacked single-scan layout profiles every column " +
        "in one shuffle keyed by (column, order)."),

    // ------------------------------------------------- l-diversity audit
    QueryDef(
      "l_diversity_audit",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), expr("n_chars div 50").as("len_bucket"),
          col("source"))
        .groupBy(col("lang"), col("len_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
        .filter(col("n_sources") < 5),
      Some("""SELECT lang, (n_chars // 50)::BIGINT AS len_bucket,
        |  count(*)::BIGINT AS n_docs,
        |  count(DISTINCT source)::BIGINT AS n_sources
        |FROM documents GROUP BY 1, 2
        |HAVING count(DISTINCT source) < 5""".stripMargin),
      "l-diversity audit (l=5) complementing k_anonymity_violations: a " +
        "quasi-identifier class is unsafe not only when it is SMALL but " +
        "when its sensitive attribute (source) takes too few distinct " +
        "values — an attacker who locates the class learns the source " +
        "even without isolating the row.  One distinct-agg pass; " +
        "violating classes are structurally the sparse tail, so output " +
        "stays tiny at any corpus size."),

    // ------------------------------------------ consistent-hash sharding
    QueryDef(
      "shard_assign_consistent",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          h48(concat(lit("doc"), col("doc_id").cast("string"))).as("dh"))
        assign(s, docs, 4, "node4")
          .join(assign(s, docs, 5, "node5"), Seq("doc_id"))
          .select(col("doc_id"), col("node4"), col("node5"),
            when(col("node4") =!= col("node5"), 1L).otherwise(0L)
              .as("moved"))
      },
      Some(s"""WITH vn AS (SELECT range AS vid,
        |    'n' || (range // 8)::VARCHAR AS node,
        |    ${h48Sql("'vn' || range::VARCHAR")} AS vh
        |  FROM range(0, 40)),
        |docs AS (SELECT doc_id,
        |    ${h48Sql("'doc' || doc_id::VARCHAR")} AS dh FROM documents),
        |${assignSql(4, "a4", "n4", "node4")},
        |${assignSql(5, "a5", "n5", "node5")}
        |SELECT n4.doc_id, node4, node5,
        |  CASE WHEN node4 <> node5 THEN 1 ELSE 0 END::BIGINT AS moved
        |FROM n4 JOIN n5 ON n5.doc_id = n4.doc_id""".stripMargin),
      "Consistent-hash shard routing with 8 virtual nodes per server: " +
        "each doc goes to the first vnode position at or clockwise-after " +
        "its own 48-bit ring position.  The query routes the same corpus " +
        "against a 4-node and a 5-node ring side by side; the defining " +
        "guarantee — growing the cluster moves ONLY the keys captured by " +
        "the new node's vnodes (≈1/5 of them), everything else stays put " +
        "— is checked row-for-row by the spec.  The ring is a 40-row " +
        "broadcast; routing is a map-side min-fold, so rebalancing " +
        "planning at 100 TB costs one scan, not a shuffle."),
  )
}
