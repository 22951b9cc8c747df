package graft

import org.apache.spark.sql.functions._

/** The directory-pruning claim behind `partitioned_write_prune`: a
  * predicate on the partition column must become a PartitionFilter
  * (pruned at file-listing time) rather than a row filter. */
class PartitionPruneSpec extends SparkSpec {

  test("lang predicate prunes to a single hive partition in the plan") {
    // materialize (or reuse) this session's app-unique partitioned
    // layout — the same directory partitioned_write_prune reads
    val path = graft.queries.ScaleQueries.docsByLangLayout(spark, sfDir)
    val scan = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(
      "PartitionFilters: \\[[^\\]]*lang#\\d+ = en".r.findFirstIn(plan).isDefined,
      s"lang predicate did not become a partition filter:\n$plan")
    assert(plan.contains("DataFilters: []"),
      s"partition predicate leaked into data filters:\n$plan")
    // and the pruned read sees exactly the en rows of the original
    val expected = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").count()
    assert(scan.count() === expected)
  }

  test("dim-derived year set becomes a dynamicpruning subquery on the " +
    "fact scan (DPP)") {
    val q = SparkEntry.registry
      .find(_.name == "dynamic_partition_prune_join").get.fn(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
    // the runtime filter targets the fact's partition column
    assert(
      "dynamicpruningexpression\\(l_year#\\d+ IN dynamicpruning".r
        .findFirstIn(plan).isDefined,
      s"DPP filter is not on the partition column:\n$plan")
  }
}
