package graft

import org.apache.spark.sql.functions._
import graft.functions.HyperplaneBucket.hyperplaneBucket
import graft.queries.DedupQueries

/** The codegen'd hyperplane bucket must be BIT-identical to the
  * declarative HOF fold (same floor(x*1e6) grid, same associative long
  * sums) on every fixture vector — the parity that lets the oracle SQL
  * mirror stay the single source of truth for the dedup bucketing. */
class HyperplaneBucketSpec extends SparkSpec {

  test("native bucket == HOF bucket on every fixture embedding") {
    val e = Tables.embeddings(spark, sfDir)
    val both = e.select(col("vec_id"),
      hyperplaneBucket(col("embedding"), DedupQueries.dplanes).as("nat"),
      DedupQueries.dBucketHof(col("embedding")).as("hof"))
    assert(both.filter(col("nat") =!= col("hof") ||
      col("nat").isNull =!= col("hof").isNull).count() === 0)
    assert(both.filter(col("nat").isNotNull).count() === e.count())
  }

  test("null embedding and wrong dimension yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array.fill(64)(0.5f))),
      (2L, Some(Array.fill(63)(0.5f))), // wrong dim
      (3L, Option.empty[Array[Float]])
    ).toDF("id", "embedding")
    val out = df.select(col("id"),
      hyperplaneBucket(col("embedding"), DedupQueries.dplanes).as("b"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(r.getLong(1)))).toMap
    assert(out(1L) != null)
    assert(out(2L) == null)
    assert(out(3L) == null)
  }

  test("kernel runs inside whole-stage codegen") {
    val plan = Tables.embeddings(spark, sfDir)
      .select(hyperplaneBucket(col("embedding"), DedupQueries.dplanes))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no WholeStageCodegen span:\n$plan")
  }
}
