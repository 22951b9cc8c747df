package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Dataset.observe(): pipeline metrics accumulated DURING the pass, not
  * by a second scan — at 100 TB a quality gate that also wants its
  * admit/reject counts must not re-read the input to count, and
  * CollectMetrics rides the existing job as accumulators (the batch
  * twin of Streams.ProgressRecorder's per-batch rows).
  *
  * Reference behavior: the ingest scripts count processed/skipped
  * records as they loop (generate_narratives_from_data.py's per-record
  * skip-if-exists bookkeeping); observe() is that bookkeeping without a
  * driver-side loop. */
class ObserveMetricsSpec extends SparkSpec {

  test("quality gate emits admit metrics in the same pass as the filter") {
    val obs = Observation("gate")
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ok", length(col("text")) >= 100)
      .observe(obs,
        count(lit(1)).as("n_seen"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_admitted"),
        sum(length(col("text")).cast("long")).as("chars_seen"))
    val admitted = docs.filter(col("ok")).drop("ok")
    val nOut = admitted.count()

    val m = obs.get
    val total = Tables.documents(spark, sfDir).count()
    assert(m("n_seen") === total)
    assert(m("n_admitted") === nOut)
    // independent recount of the byte meter
    val chars = Tables.documents(spark, sfDir)
      .agg(sum(length(col("text")).cast("long"))).head().getLong(0)
    assert(m("chars_seen") === chars)
  }

  test("observed metrics agree across two different downstream actions") {
    // The metric is a property of the observed subtree, not of what the
    // consumer does with it — the same observe node feeds an agg here.
    val obs = Observation("gate2")
    val n = Tables.documents(spark, sfDir)
      .observe(obs, count(lit(1)).as("n_seen"))
      .groupBy(col("lang")).count().collect().map(_.getLong(1)).sum
    assert(obs.get("n_seen") === n)
  }
}
