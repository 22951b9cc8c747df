package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline health instrumentation with Dataset.observe: named metrics
  * accumulate DURING an action instead of re-scanning — at 100 TB a
  * separate .count() for monitoring doubles the I/O bill; an observation
  * rides the existing pass for free (the streaming form feeds
  * StreamingQueryListener the same way). */
class ObservabilitySpec extends SparkSpec {

  test("observe collects row counts and sums in the same pass") {
    val obs = Observation("ingest_metrics")
    val docs = Tables.documents(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(col("n_chars")).as("chars_seen"),
        count(when(col("lang") === "en", 1)).as("en_rows"))
      .filter(col("n_chars") > 100)
    val kept = docs.count() // one action: metrics + result together
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] ===
      Tables.documents(spark, sfDir).count())
    assert(m("rows_seen").asInstanceOf[Long] >= kept)
    assert(m("chars_seen").asInstanceOf[Long] > 0L)
    assert(m("en_rows").asInstanceOf[Long] > 0L)
  }
}
