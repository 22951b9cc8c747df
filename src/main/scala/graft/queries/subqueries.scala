package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Correlated-subquery surface, driven through the SQL front door
  * (`spark.sql` over temp views) rather than the DataFrame API: EXISTS /
  * NOT EXISTS predicates and a correlated scalar aggregate subquery.
  *
  * These exercise Catalyst's decorrelation (RewriteCorrelatedScalarSubquery,
  * RewritePredicateSubquery): the optimizer turns each subquery into the
  * same semi/anti/aggregate-join plans the API formulations produce
  * (semijoin_available / antijoin_completed / argmax_event_per_user), so
  * SQL users get the identical scale shape — one equi-shuffle per
  * subquery, never a per-row re-execution.
  *
  * Reference anchor: the reference's skip-if-done scan
  * (create_all_models.py:43-47) is an EXISTS check against the output
  * directory; here it is the same predicate over a ledger table.
  */
object SubqueryQueries {

  private def withViews(s: SparkSession, d: String)(sql: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_v")
    Tables.part(s, d).createOrReplaceTempView("graft_part_v")
    s.sql(sql)
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "exists_correlated",
      (s, d) => withViews(s, d)(
        """SELECT o.o_orderkey,
          |       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS total_cents
          |FROM graft_orders_v o
          |WHERE EXISTS (SELECT 1 FROM graft_lineitem_v l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_quantity >= 48)
          |  AND NOT EXISTS (SELECT 1 FROM graft_lineitem_v l
          |                  WHERE l.l_orderkey = o.o_orderkey
          |                    AND l.l_returnflag = 'R')""".stripMargin),
      Some("""SELECT o.o_orderkey,
        |       floor(o.o_totalprice * 100)::BIGINT AS total_cents
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 48)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey
        |                    AND l.l_returnflag = 'R')""".stripMargin),
      "Correlated EXISTS / NOT EXISTS through the SQL surface: orders " +
        "containing a bulk line (quantity >= 48) with no returned lines. " +
        "Catalyst decorrelates both predicates into one left-semi and " +
        "one left-anti hash join on l_orderkey — the subqueries cost two " +
        "equi-shuffles total regardless of order count, identical to the " +
        "hand-written API joins (semijoin_available/antijoin_completed)."),

    QueryDef(
      "scalar_subquery_above_avg",
      (s, d) => withViews(s, d)(
        """WITH pc AS (SELECT p_partkey, p_type,
          |    CAST(floor(p_retailprice * 100) AS BIGINT) AS cents
          |  FROM graft_part_v)
          |SELECT p.p_type, COUNT(*) AS n_above, MAX(p.cents) AS max_cents
          |FROM pc p
          |WHERE p.cents > (SELECT SUM(c2.cents) div COUNT(*)
          |                 FROM pc c2 WHERE c2.p_type = p.p_type)
          |GROUP BY p.p_type""".stripMargin),
      Some("""WITH pc AS (SELECT p_partkey, p_type,
        |    floor(p_retailprice * 100)::BIGINT AS cents FROM part)
        |SELECT p.p_type, count(*)::BIGINT AS n_above,
        |       max(p.cents)::BIGINT AS max_cents
        |FROM pc p
        |WHERE p.cents > (SELECT sum(c2.cents) // count(*)
        |                 FROM pc c2 WHERE c2.p_type = p.p_type)
        |GROUP BY p.p_type""".stripMargin),
      "Correlated scalar aggregate subquery via SQL: parts priced above " +
        "their type's mean (exact integer cents, truncating division — " +
        "same value in both engines). Catalyst rewrites the per-row " +
        "subquery into one aggregate over pc plus a hash join on p_type: " +
        "the correlation costs one extra shuffle of the small per-type " +
        "averages, not a subquery execution per row."),
  )
}
