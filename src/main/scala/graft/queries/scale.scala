package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Scale-path techniques demonstrated as oracle-checked queries: the
  * result is identical to the naive formulation, the physical plan is
  * the one that survives 100 TB.  These are the patterns the rest of the
  * engine reaches for when a key distribution goes hostile. */
object ScaleQueries {

  private val Salts = 8

  /** Materialize a partitioned layout ONCE per (kind, dataset,
    * application) and reuse it: the path is keyed by the Spark
    * applicationId plus a hash of the dataset dir, so concurrent
    * sessions (separate JVMs/apps) never clobber each other, and
    * repeated executions of the same query in one app (bench
    * iterations, spec re-runs) re-read the already-written layout
    * instead of re-paying — and re-measuring — the write. */
  // memo + collision safety + shutdown cleanup hoisted to
  // graft.Scratch.buildOnce (shared with curation56's graph/delta
  // tables so the locking and path scheme live in one place)
  private def layoutOnce(s: SparkSession, d: String, kind: String)(
      write: String => Unit): String =
    graft.Scratch.buildOnce(s, d, kind)(write)

  /** The lang-partitioned documents layout `partitioned_write_prune`
    * reads — exposed so PartitionPruneSpec audits the exact directory
    * this session materialized (the path is app-unique, see
    * [[layoutOnce]]). */
  def docsByLangLayout(s: SparkSession, d: String): String =
    layoutOnce(s, d, "docs_by_lang") { p =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(p)
    }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------ salted join
    QueryDef(
      "skewjoin_salted",
      (s, d) => {
        // events.user_id x a per-user dimension derived from customer.
        // Hot keys (low user ids dominate a zipf-ish stream) would pile
        // into one task in a plain shuffle join; salting splits each key
        // into `Salts` shuffle buckets: fact side gets a random-but-
        // deterministic salt, the dim side is exploded across all salts.
        val facts = Tables.events(s, d)
          .withColumn("salt", pmod(col("event_id"), lit(Salts)))
        val dim = Tables.customer(s, d)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
          .withColumn("salt",
            explode(sequence(lit(0L), lit((Salts - 1).toLong))))
        facts.join(dim, Seq("user_id", "salt"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"),
            (sum(floor(col("value") * 100)) / 100.0).as("total_value"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_events,
        | sum(floor(value * 100)) / 100.0 AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin),
      "Skew-salted equi-join: per-row salt on the fact side, salt-exploded " +
        "dimension — same result as the plain join (the oracle), but the " +
        "hot key's rows spread over 8 tasks. At 100 TB this (or AQE " +
        "skew-join splitting) is mandatory for zipf-distributed keys."),

    // --------------------------------------------- pre-partitioned agg
    QueryDef(
      "repartitioned_two_phase_agg",
      (s, d) => {
        // Two aggregations on the same key in ONE two-phase pass
        // (partial map-side + one exchange + final).  The tempting
        // two-branch formulation — repartition once, aggregate twice,
        // join — does NOT reuse the exchange in the executed plan:
        // column pruning specializes each branch's exchange (the count
        // branch drops `value`), the canonical subtrees stop matching,
        // and the fact shuffles twice (measured; ExchangeReuseSpec
        // pins this query to exactly one exchange, and keeps
        // tpch_q17_small_quantity as the genuine ReusedExchange case
        // where both consumers need identical columns).
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            (sum(floor(col("value") * 100)) / 100.0).as("total_value"))
      },
      Some("""SELECT user_id, count(*) AS n,
        | sum(floor(value * 100)) / 100.0 AS total_value
        |FROM events GROUP BY user_id""".stripMargin),
      "Multi-aggregate two-phase pass: both measures ride one partial-" +
        "aggregated shuffle on the key. The two-branch repartition+join " +
        "alternative double-shuffles the fact once column pruning " +
        "specializes the branch exchanges — the plan-shape trap this " +
        "query exists to document; exchange REUSE is real only when " +
        "consumers need identical columns (see tpch_q17)."),

    // ----------------------------------------- partition-pruned reading
    QueryDef(
      "partition_pruned_scan",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("l_extendedprice") * 100)) / 100.0).as("revenue")),
      Some("""SELECT l_returnflag, count(*) AS n,
        | sum(floor(l_extendedprice * 100)) / 100.0 AS revenue
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag""".stripMargin),
      "Predicate reaches the parquet scan (PushedFilters on l_shipdate, " +
        "row-group skipping); with a date-partitioned 100 TB layout the " +
        "same predicate prunes whole partitions before any I/O."),

    // ------------------------------------ directory-partition pruning
    QueryDef(
      "partitioned_write_prune",
      (s, d) => {
        // The directory-layout half of the pruning story (the row above
        // is the row-group half): write documents hive-partitioned by
        // lang, read back with a lang predicate — the scan lists ONLY
        // the matching directory (PartitionFilters, asserted by
        // PartitionPruneSpec), so the other partitions cost zero I/O
        // AND zero listing at 100 TB.
        val path = docsByLangLayout(s, d)
        s.read.parquet(path)
          .filter(col("lang") === "en")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("chars"))
      },
      Some("""SELECT count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents WHERE lang = 'en'""".stripMargin),
      "Hive-style partitioned write + partition-pruned read: the lang " +
        "predicate becomes a PartitionFilter (directory pruning at " +
        "file-listing time), not a data filter — the layout choice " +
        "that turns a full-corpus scan into a single-partition read. " +
        "Values oracle-checked against the unpartitioned original."),

    // ------------------------------------ dynamic partition pruning
    QueryDef(
      "dynamic_partition_prune_join",
      (s, d) => {
        // The RUNTIME half of partition pruning: the fact is laid out
        // by ship year, and the year set to read is only known after
        // filtering the dimension — so no static predicate exists on
        // the fact side at plan time.  Spark's dynamic partition
        // pruning turns the broadcast dim into a runtime IN-subquery
        // on the fact's partition column (dynamicpruning#N in the
        // scan, asserted by PartitionPruneSpec), so the 100 TB fact
        // reads only the partitions the dim selects — the star-schema
        // pattern DPP exists for.
        val path = layoutOnce(s, d, "li_by_year") { p =>
          Tables.lineitem(s, d)
            .select(col("l_returnflag"),
              floor(col("l_extendedprice") * 100).cast("long")
                .as("price_e2"),
              year(col("l_shipdate")).as("l_year"))
            .write.mode("overwrite").partitionBy("l_year").parquet(p)
        }
        val urgentYears = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(year(col("o_orderdate")).as("o_year")).distinct()
        s.read.parquet(path)
          .join(urgentYears, col("l_year") === col("o_year"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("price_e2")).as("revenue_e2"))
      },
      Some("""WITH uy AS (SELECT DISTINCT year(o_orderdate) AS o_year
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |    AND o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |  sum(floor(l_extendedprice * 100)::BIGINT)::BIGINT AS revenue_e2
        |FROM lineitem JOIN uy ON year(l_shipdate) = o_year
        |GROUP BY l_returnflag""".stripMargin),
      "Dynamic partition pruning: the fact is partitioned by ship " +
        "year and the qualifying year set only materializes at " +
        "runtime from the filtered dimension — DPP injects the " +
        "broadcast result as a subquery filter on the fact's " +
        "partition column, so only the selected year directories are " +
        "read.  Static pruning (the two rows above) cannot express " +
        "this; the oracle recomputes on the unpartitioned original."),
  )
}
