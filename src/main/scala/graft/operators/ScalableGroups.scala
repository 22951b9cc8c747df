package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group order statistics WITHOUT a per-group window — the 100 TB
  * form of `row_number()/sum().over(Window.partitionBy(enumCol)
  * .orderBy(...))` when the partition key is a LOW-CARDINALITY ENUM
  * (lang, source, split): the window's hash partitioning concentrates
  * corpus-size / |enum| rows on a handful of tasks, which is the same
  * scale-killer as the unpartitioned window, merely divided by five.
  *
  * Shape: run the GLOBAL primitive over the total order
  * (groupCols ++ orderCols) — one range exchange, every task holds only
  * its key range regardless of how the enum distributes — then rebase
  * each row by its group's offset:
  *
  *   rank within group  = global dense index - first index of the group
  *   running sum within = global running sum - sum of preceding groups
  *
  * Group offsets come from one hash aggregate over the indexed output
  * (|groups| rows) broadcast back — which is why the CONTRACT requires
  * the group key to be broadcast-small (an enum, not users/doc_ids).
  * Corpus-size data never funnels through an enum-cardinality task:
  * the heavy exchange is range-partitioned on the full order, and the
  * per-group correction is a map-side broadcast join.
  *
  * Ordering contract (inherited from ScalableIndex/ScalablePrefix):
  * groupCols ++ orderCols must be a TOTAL order (append a unique
  * tiebreaker), and orderCols are ASCENDING (the offset aggregate uses
  * min/min_by over the group, which assumes the group's first row in
  * the total order carries the smallest order tuple).
  */
object ScalableGroups {

  /** Broadcast-join `right`'s per-group row back onto `left` with
    * NULL-SAFE key equality: `Window.partitionBy` puts NULL-key rows in
    * a partition of their own and emits them, and `groupBy` likewise
    * keeps a NULL group — so the rebase join must match them too, or
    * every NULL-group row silently vanishes from the output (the
    * using-columns join's `=` would drop them). */
  private def joinGroupsNullSafe(left: DataFrame, right: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val renamed = groupCols.foldLeft(right)(
      (r, c) => r.withColumnRenamed(c, s"__gk_$c"))
    val cond = groupCols.map(c => left(c) <=> renamed(s"__gk_$c"))
      .reduce(_ && _)
    left.join(broadcast(renamed), cond)
      .drop(groupCols.map(c => s"__gk_$c"): _*)
  }

  /** Adds `rankCol` = 1-based rank of the row within its group in
    * `orderCols` order, and `sizeCol` = rows in the group. Exact
    * equivalent of
    * `row_number().over(Window.partitionBy(groupCols).orderBy(orderCols))`
    * + `count(*).over(Window.partitionBy(groupCols))`. */
  def withGroupRank(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], numParts: Int,
      rankCol: String = "grank", sizeCol: String = "gsize"): DataFrame = {
    val idxd = ScalableIndex.withDenseIndex(df,
      groupCols.map(col) ++ orderCols, numParts, "__gidx")
    val bounds = idxd.groupBy(groupCols.map(col): _*)
      .agg(min(col("__gidx")).as("__glo"),
        count(lit(1)).as(sizeCol))
    joinGroupsNullSafe(idxd, bounds, groupCols)
      .withColumn(rankCol, col("__gidx") - col("__glo") + 1)
      .drop("__gidx", "__glo")
  }

  /** Adds, for each name c in `sumCols`, `prefix+c` = the running sum
    * of c within the row's group in `orderCols` order — inclusive, or
    * with `exclusive = true` the `rowsBetween(unboundedPreceding, -1)`
    * frame (0 on the group's first row, matching
    * `coalesce(sum(c).over(...), 0)`). Sum columns must be non-null
    * LongType. */
  def withGroupRunningSums(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], sumCols: Seq[String], numParts: Int,
      exclusive: Boolean = false, prefix: String = "cum_"): DataFrame = {
    val cum = ScalablePrefix.withRunningSums(df,
      groupCols.map(col) ++ orderCols, sumCols, numParts, "__gcum_")
    // global exclusive prefix at each row; its value on the group's
    // FIRST row (min_by the order tuple — sign-safe even for negative
    // sum columns) is the total mass of all preceding groups
    val withBefore = sumCols.foldLeft(cum) { (acc, c) =>
      acc.withColumn(s"__gbef_$c", col(s"__gcum_$c") - col(c))
    }
    val orderKey = struct(orderCols: _*)
    val offs = withBefore.groupBy(groupCols.map(col): _*)
      .agg(min_by(col(s"__gbef_${sumCols.head}"), orderKey)
          .as(s"__off_${sumCols.head}"),
        sumCols.tail.map(c =>
          min_by(col(s"__gbef_$c"), orderKey).as(s"__off_$c")): _*)
    val joined = joinGroupsNullSafe(withBefore, offs, groupCols)
    val rebased = sumCols.foldLeft(joined) { (acc, c) =>
      val in = if (exclusive) col(s"__gbef_$c") else col(s"__gcum_$c")
      acc.withColumn(prefix + c, in - col(s"__off_$c"))
    }
    sumCols.foldLeft(rebased) { (acc, c) =>
      acc.drop(s"__gcum_$c", s"__gbef_$c", s"__off_$c")
    }
  }
}
