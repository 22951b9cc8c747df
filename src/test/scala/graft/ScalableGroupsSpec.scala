package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ScalableGroups

/** ScalableGroups must agree EXACTLY with the enum-partitioned window
  * forms it replaces (row_number / count over partitionBy(enum), and
  * running sums in both frames) — while executing as one range
  * exchange over the total order plus a broadcast per-group offset,
  * never an enum-cardinality window task.
  */
class ScalableGroupsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  test("withGroupRank matches row_number + count over the enum window") {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    val windowed = docs.select(col("doc_id"),
      row_number().over(w).cast("long").as("r"),
      count(lit(1)).over(Window.partitionBy(col("lang"))).as("n"))
    val scalable = ScalableGroups.withGroupRank(docs, Seq("lang"),
        Seq(col("n_chars"), col("doc_id")), 7, "r", "n")
      .select(col("doc_id"), col("r"), col("n"))
    assert(scalable.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(scalable).count() === 0)
  }

  test("NULL group keys survive and match the window semantics") {
    // Window.partitionBy puts NULL-key rows in their own partition and
    // emits them; the rebase join must be null-safe or they vanish
    val withNulls = docs.withColumn("lang",
      when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("lang")))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    val windowed = withNulls.select(col("doc_id"),
      row_number().over(w).cast("long").as("r"),
      count(lit(1)).over(Window.partitionBy(col("lang"))).as("n"))
    val scalable = ScalableGroups.withGroupRank(withNulls, Seq("lang"),
        Seq(col("n_chars"), col("doc_id")), 7, "r", "n")
      .select(col("doc_id"), col("r"), col("n"))
    assert(scalable.count() === withNulls.count(), "rows dropped")
    assert(scalable.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(scalable).count() === 0)
    // and the running-sum form
    val longDocs = withNulls.withColumn("len", col("n_chars"))
    val wsum = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val winSum = longDocs.select(col("doc_id"),
      sum(col("len")).over(wsum).as("cum_len"))
    val scalSum = ScalableGroups.withGroupRunningSums(longDocs,
        Seq("lang"), Seq(col("n_chars"), col("doc_id")), Seq("len"), 7)
      .select(col("doc_id"), col("cum_len"))
    assert(scalSum.exceptAll(winSum).count() === 0)
    assert(winSum.exceptAll(scalSum).count() === 0)
  }

  test("withGroupRank is partition-count invariant") {
    val a = ScalableGroups.withGroupRank(docs, Seq("source"),
      Seq(col("n_chars"), col("doc_id")), 3, "r", "n")
      .select(col("doc_id"), col("r"), col("n"))
    val b = ScalableGroups.withGroupRank(docs, Seq("source"),
      Seq(col("n_chars"), col("doc_id")), 16, "r", "n")
      .select(col("doc_id"), col("r"), col("n"))
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("withGroupRunningSums matches the windowed frames, inclusive " +
    "and exclusive") {
    val base = docs.select(col("doc_id"), col("lang"),
      col("n_chars").cast("long").as("v"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val windowed = base.select(col("doc_id"),
      sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("inc"),
      coalesce(sum(col("v")).over(w.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L)).as("exc"))
    val inc = ScalableGroups.withGroupRunningSums(base, Seq("lang"),
      Seq(col("doc_id")), Seq("v"), 7)
    val exc = ScalableGroups.withGroupRunningSums(base, Seq("lang"),
      Seq(col("doc_id")), Seq("v"), 7, exclusive = true, prefix = "exc_")
    val scalable = inc.select(col("doc_id"), col("cum_v"))
      .join(exc.select(col("doc_id"), col("exc_v")), "doc_id")
      .select(col("doc_id"), col("cum_v").as("inc"), col("exc_v").as("exc"))
    assert(scalable.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(scalable).count() === 0)
  }

  test("running sums stay exact for groups with negative values") {
    import spark.implicits._
    // group offsets use min_by over the order tuple, not min of the
    // prefix — a negative-heavy first group would break a min() offset
    val df = Seq(
      ("a", 1L, -10L), ("a", 2L, 5L), ("a", 3L, -7L),
      ("b", 1L, 100L), ("b", 2L, -200L), ("c", 1L, -1L))
      .toDF("g", "i", "v")
    val got = ScalableGroups.withGroupRunningSums(df, Seq("g"),
        Seq(col("i")), Seq("v"), 4)
      .select(col("g"), col("i"), col("cum_v"))
      .as[(String, Long, Long)].collect().sorted
    assert(got === Array(
      ("a", 1L, -10L), ("a", 2L, -5L), ("a", 3L, -12L),
      ("b", 1L, 100L), ("b", 2L, -100L), ("c", 1L, -1L)))
  }

  test("no WindowExec anywhere in the ScalableGroups plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = ScalableGroups.withGroupRank(docs, Seq("lang"),
      Seq(col("n_chars"), col("doc_id")), 7, "r", "n")
      .queryExecution.executedPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty)
  }

  test("migrated queries execute through the partition-offset RDD " +
    "pass, with no WindowExec anywhere") {
    // The range exchange lives INSIDE the ScalableIndex/Prefix RDD
    // lineage (queryExecution.toRdd of the range-partitioned sort), so
    // the outer plan cannot show it — what it must show is (a) a scan
    // of that existing internal RDD (the Bridge hand-off) and (b) the
    // total absence of WindowExec: any reappearing window means the
    // migration regressed to the enum-partitioned form.
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("percent_rank_cume", "pack_sequences", "gini_length_concentration",
      "quantile_normalize_scores", "mad_outlier_flag", "target_encode_loo",
      "compaction_packing_plan", "weighted_median_length").foreach { name =>
      val plan = SparkEntry.registry.find(_.name == name).get
        .fn(spark, sfDir).queryExecution.sparkPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        s"$name plans a WindowExec again")
      // all but the broadcast-only target_encode_loo ride the Bridge
      if (name != "target_encode_loo")
        assert(plan.toString.contains("ExistingRDD"),
          s"$name does not read the partition-offset RDD:\n$plan")
    }
  }
}
