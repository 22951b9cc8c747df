package graft

import org.apache.spark.sql.functions._
import graft.functions.{RewriteTokenCount, SwKernel}
import graft.functions.TokenCountKernel.tokenCount

/** Batch-4 invariants: Smith-Waterman laws, token-count kernel parity
  * and rewrite rule, histogram-drift recompute. */
class Curation10Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  // ------------------------------------------------ Smith-Waterman

  /** Full-matrix SW, independent of the kernel's rolling rows. */
  private def swRef(a: String, b: String): Long = {
    val x = a.split(" ", -1); val y = b.split(" ", -1)
    val dp = Array.ofDim[Long](x.length + 1, y.length + 1)
    var best = 0L
    for (i <- 1 to x.length; j <- 1 to y.length) {
      val s = dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 2L else -1L)
      dp(i)(j) = math.max(0L,
        math.max(s, math.max(dp(i - 1)(j) - 1, dp(i)(j - 1) - 1)))
      best = math.max(best, dp(i)(j))
    }
    best
  }

  test("smith_waterman_pairs matches the full-matrix recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = byName("smith_waterman_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pid, score, lb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val ta = docs(pid)
      val tb = ta.substring(0, ta.length * 9 / 10)
      assert(score === swRef(ta, tb), s"pair $pid")
      // prefix alignment: the local score reaches at least 2*(lb-1)
      // (all but possibly the cut final token align as matches)
      assert(score >= 2 * (lb - 1), s"pair $pid weak alignment")
      assert(score <= 2 * lb)
    }
  }

  test("smith_waterman kernel laws on adversarial inputs") {
    import spark.implicits._
    val rows = Seq(
      ("a b c", "a b c", 6L),           // perfect match
      ("a b c", "x y z", 0L),           // nothing aligns (floor at 0)
      ("p q a b c r", "z a b c z", 6L), // local region ignores flanks
      ("a", "a", 2L),
      ("a b a b", "a b", 4L))
    val got = rows.toDF("a", "b", "want")
      .select(graft.functions.SwKernel.smithWaterman(col("a"), col("b"))
        .as("s"), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // symmetry under swap for these scoring params
    val sym = rows.toDF("a", "b", "w")
      .select(graft.functions.SwKernel.smithWaterman(col("a"), col("b")) ===
        graft.functions.SwKernel.smithWaterman(col("b"), col("a")))
      .collect()
    assert(sym.forall(_.getBoolean(0)))
  }

  // ------------------------------------------------ token_count

  test("token_count kernel equals size(split) on fixture and edges") {
    val fixture = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).as("viaSplit"),
        tokenCount(col("text")).as("viaKernel"))
      .filter(col("viaSplit") =!= col("viaKernel"))
    assert(fixture.count() === 0)
    import spark.implicits._
    val edges = Seq("", " ", "a", "a ", " a", "a  b", "héllo wörld",
      "多字节 字符 test")
    val got = edges.toDF("t")
      .select(size(split(col("t"), " ")).as("s"),
        tokenCount(col("t")).as("k")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("RewriteTokenCount rewrites the space form and only that form") {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteTokenCount
    try {
      val q = Tables.documents(spark, sfDir)
        .select(size(split(col("text"), " ")).as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("token_count"), s"not rewritten:\n$plan")
      assert(!plan.contains("split"), s"split survived:\n$plan")
      // rewritten plan computes identical values
      val viaRule = q.agg(sum(col("n"))).head().getLong(0)
      spark.experimental.extraOptimizations = before
      val plain = Tables.documents(spark, sfDir)
        .select(size(split(col("text"), " ")).as("n"))
        .agg(sum(col("n"))).head().getLong(0)
      assert(viaRule === plain)
      // negative: regex separators are left alone
      spark.experimental.extraOptimizations = before :+ RewriteTokenCount
      val negative = Tables.documents(spark, sfDir)
        .select(size(split(col("text"), "\\s+")).as("n"))
        .queryExecution.optimizedPlan.toString
      assert(!negative.contains("token_count"), s"over-matched:\n$negative")
    } finally spark.experimental.extraOptimizations = before
  }

  // ------------------------------------------------ histogram drift

  test("histogram_drift_l1 recomputes from raw lengths") {
    val lens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).as("l")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val h1 = lens.map(_._2 / 50).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val v2lens = lens.filter(_._1 % 7 != 0)
      .map { case (id, l) => if (id % 11 == 0) l + 3 else l } ++
      lens.filter(_._1 % 13 == 0).map(_._2)
    val h2 = v2lens.map(_ / 50).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val nt1 = h1.values.sum; val nt2 = h2.values.sum
    val sad = (h1.keySet ++ h2.keySet).toSeq.map { b =>
      math.abs(h1.getOrElse(b, 0L) * nt2 - h2.getOrElse(b, 0L) * nt1)
    }.sum
    val want = 1000 * sad / (2 * nt1 * nt2)
    val r = byName("histogram_drift_l1").head()
    assert(r.getLong(0) === nt1 && r.getLong(1) === nt2)
    assert(r.getLong(2) === want)
    // drift of a corpus against itself is zero
    assert(want >= 0 && r.getLong(2) < 1000)
  }
}
