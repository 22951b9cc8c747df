package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, RewriteCosineHof}
import graft.functions.VectorOps._

/** The injected optimizer rule (GraftExtensions.injectOptimizerRule):
  * the public-API HOF cosine formulation must be rewritten to the fused
  * native kernel, with identical results.
  *
  * The rule is exercised here through experimental.extraOptimizations
  * (same user-provided optimizer batch the extension hook feeds) so the
  * shared test session stays extension-free — VectorOpsSpec's
  * HOF-vs-native bit-parity test depends on the HOF path NOT being
  * rewritten there. Verify/Bench run with
  * spark.sql.extensions=graft.functions.GraftExtensions, covering the
  * deploy-time registration end-to-end across the full registry.
  */
class RewriteRuleSpec extends SparkSpec {

  private def pairs = {
    val e = Tables.embeddings(spark, sfDir)
    e.select(col("vec_id"), col("embedding").as("a"))
      .filter(col("vec_id") < 20)
      .crossJoin(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("b")))
  }

  test("HOF cosine is rewritten to the native kernel and matches it") {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteCosineHof
    try {
      val df = pairs.select(col("vec_id"),
        cosineHof(col("a"), col("b")).as("cos"))
      val optimized = df.queryExecution.optimizedPlan
      val natives = optimized.expressions.flatMap(_.collect {
        case c: CosineSimilarity => c
      })
      assert(natives.nonEmpty,
        s"expected CosineSimilarity in optimized plan:\n$optimized")
      val viaRule = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaNative = pairs.select(col("vec_id"),
        cosine(col("a"), col("b")).as("cos"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaRule == viaNative) // bit-identical, not approximately
    } finally spark.experimental.extraOptimizations = before
  }

  test("rule leaves non-cosine HOF aggregates alone") {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteCosineHof
    try {
      // a plain dot product (no norm divide) must NOT be rewritten
      val df = pairs.select(dot(col("a"), col("b")).as("d"))
      val natives = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case c: CosineSimilarity => c })
      assert(natives.isEmpty)
      // and it still evaluates
      assert(df.count() == 20)
    } finally spark.experimental.extraOptimizations = before
  }

  test("bounded top-k idiom is rewritten to TopKLongsAgg, both directions") {
    import graft.functions.{RewriteBoundedTopK, TopKLongsAgg}
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteBoundedTopK
    try {
      def idiom(asc: Boolean) = Tables.documents(spark, sfDir)
        .groupBy(col("lang"))
        .agg(slice(sort_array(collect_list(col("n_chars")), asc = asc),
          1, 5).as("head5"))
      for (asc <- Seq(true, false)) {
        val df = idiom(asc)
        val rewritten = df.queryExecution.optimizedPlan.expressions
          .flatMap(_.collect { case t: TopKLongsAgg => t })
        assert(rewritten.nonEmpty, s"asc=$asc not rewritten")
        assert(rewritten.head.largest == !asc)
        // value-identical to the unoptimized evaluation
        val plain = {
          spark.experimental.extraOptimizations = before
          val r = idiom(asc).collect()
            .map(r2 => r2.getString(0) -> r2.getSeq[Long](1)).toMap
          spark.experimental.extraOptimizations = before :+ RewriteBoundedTopK
          r
        }
        val viaRule = df.collect()
          .map(r2 => r2.getString(0) -> r2.getSeq[Long](1)).toMap
        assert(viaRule == plain, s"asc=$asc mismatch")
      }
      // slice not starting at 1 must NOT be rewritten
      val off = Tables.documents(spark, sfDir).groupBy(col("lang"))
        .agg(slice(sort_array(collect_list(col("n_chars"))), 2, 5).as("mid"))
      assert(off.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case t: TopKLongsAgg => t }).isEmpty)
      assert(off.count() == 5)
    } finally spark.experimental.extraOptimizations = before
  }
}
