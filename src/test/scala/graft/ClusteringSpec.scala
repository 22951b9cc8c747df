package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Laws of per-file column statistics and 1-D re-clustering
  * (`optimizeClusterBy`): stats are recorded on every write, pruning
  * through them never changes an answer (only the scanned file set),
  * clustering makes non-key pruning strict, and both compose with
  * deletion vectors and schema evolution. */
class ClusteringSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_cluspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  /** score is DELIBERATELY anti-correlated with the key so the initial
    * key-ranged layout gives score-pruning nothing to skip. */
  private def scored(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"t$i", (n - 1 - i).toLong))
      .toDF("doc_id", "text", "score")
  }

  test("every write records per-file min/max for non-key long columns") {
    val root = freshRoot("stats")
    VersionedTable.append(spark, root, scored(100), "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root, 1)
    assert(snap.files.size === 4)
    snap.files.foreach { f =>
      assert(f.stats.contains("score"), s"missing score stats in $f")
      val (mn, mx) = f.stats("score")
      assert(mn <= mx)
    }
    // bounds are exact: union of per-file ranges covers 0..99 and the
    // per-file spans are disjoint in doc_id but each file's score span
    // mirrors its key span (anti-correlated fixture)
    assert(snap.files.map(_.stats("score")._1).min === 0L)
    assert(snap.files.map(_.stats("score")._2).max === 99L)
  }

  test("stats pruning keeps the answer and only shrinks the file set; " +
    "un-statsed history is conservatively kept") {
    val root = freshRoot("prune")
    VersionedTable.append(spark, root, scored(100), "doc_id", 4)
    val full = VersionedTable.read(spark, root)
      .filter(col("score") < 10L)
    val pruned = VersionedTable.read(spark, root,
      ranges = Map("score" -> (0L, 9L)))
      .filter(col("score") < 10L)
    assert(pruned.exceptAll(full).count() === 0 &&
      full.exceptAll(pruned).count() === 0)
    // anti-correlated layout: score 0..9 lives in the TOP key file —
    // pruning on score keeps exactly the files whose span intersects
    val snap = VersionedTable.snapshot(spark, root, 1)
    val kept = VersionedTable.statsPrunedFiles(snap.files,
      Map("score" -> (0L, 9L)))
    assert(kept.size < snap.files.size)
    // a column with no stats anywhere keeps everything (conservative)
    assert(VersionedTable.statsPrunedFiles(snap.files,
      Map("nosuch" -> (0L, 1L))).size === snap.files.size)
  }

  test("optimizeClusterBy re-partitions on the cluster column: " +
    "row-preserving, and a narrow non-key range then scans a strict " +
    "file subset") {
    val root = freshRoot("cluster")
    VersionedTable.append(spark, root, scored(100), "doc_id", 4)
    val v = VersionedTable.optimizeClusterBy(spark, root, "score",
      "doc_id", 4)
    assert(v === 2)
    val snap = VersionedTable.snapshot(spark, root, 2)
    assert(snap.op === "cluster")
    // row-preserving
    assert(VersionedTable.read(spark, root).count() === 100)
    // clustered: per-file score spans are narrow and pruning is strict
    val kept = VersionedTable.statsPrunedFiles(snap.files,
      Map("score" -> (0L, 9L)))
    assert(kept.size === 1,
      s"score 0..9 must live in one clustered file, kept ${kept.size}")
    val got = VersionedTable.read(spark, root,
      ranges = Map("score" -> (0L, 9L)))
      .filter(col("score") <= 9L)
    assert(got.count() === 10)
    // key-range pruning still CORRECT after clustering (spans widen,
    // pruning degrades, answers don't change)
    assert(VersionedTable.read(spark, root, idRange = Some((0L, 9L)))
      .filter(col("doc_id") <= 9L).count() === 10)
  }

  test("clustering materializes deletion vectors and keeps live rows") {
    val root = freshRoot("clusdv")
    VersionedTable.append(spark, root, scored(60), "doc_id", 3)
    VersionedTable.deleteMoR(spark, root,
      pmod(col("doc_id"), lit(6)) === 0, "doc_id")
    VersionedTable.optimizeClusterBy(spark, root, "score", "doc_id", 3)
    val snap = VersionedTable.snapshot(spark, root, 3)
    assert(snap.files.forall(_.dv.isEmpty))
    assert(snap.rows === 50)
    assert(VersionedTable.read(spark, root).count() === 50)
    assert(VersionedTable.read(spark, root)
      .filter(pmod(col("doc_id"), lit(6)) === 0).count() === 0)
  }

  test("optimizeZOrder: a narrow range on EITHER dimension alone " +
    "prunes to a strict file subset; rows and answers preserved") {
    import spark.implicits._
    val root = freshRoot("zorder")
    // de-correlated 2-D spread (score = i*37 mod 100): 1-D clustering
    // on either column would leave the other unprunable
    val df = (0 until 100).map(i =>
      (i.toLong, s"t$i", ((i * 37) % 100).toLong))
      .toDF("doc_id", "text", "score")
    VersionedTable.append(spark, root, df, "doc_id", 4)
    val v = VersionedTable.optimizeZOrder(spark, root, "doc_id", "score",
      "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root, v)
    assert(snap.op === "zorder")
    assert(VersionedTable.read(spark, root).count() === 100)
    // dimension 1 (the key, via per-file minId/maxId): doc_id < 10
    // maps to grid cells x < 7 — only quadrant files with x-span
    // below 32 can intersect
    val keptId = snap.files.filter(f => f.maxId >= 0L && f.minId <= 9L)
    assert(keptId.size < snap.files.size,
      s"id-range prune must be strict, kept ${keptId.size}")
    // dimension 2 (column stats): score 0..9
    val keptScore = VersionedTable.statsPrunedFiles(snap.files,
      Map("score" -> (0L, 9L)))
    assert(keptScore.size < snap.files.size,
      s"score-range prune must be strict, kept ${keptScore.size}")
    // answers through both pruned paths match the plain filters
    assert(VersionedTable.read(spark, root, idRange = Some((0L, 9L)))
      .filter(col("doc_id") <= 9L).count() === 10)
    assert(VersionedTable.read(spark, root,
      ranges = Map("score" -> (0L, 9L)))
      .filter(col("score") <= 9L).count() === 10)
  }

  test("stats survive the manifest round-trip and schema evolution " +
    "adds stats for the new column on rewrite") {
    import spark.implicits._
    val root = freshRoot("evo")
    VersionedTable.append(spark, root, scored(40), "doc_id", 2)
    // evolved upsert adds a long column: rewritten + new files carry
    // its stats, and reads of old snapshots still parse
    val evolved = (0L until 10L).map(i => (i, s"e$i", 5L, i * 2))
      .toDF("doc_id", "text", "score", "quality")
    VersionedTable.merge(spark, root, evolved, "doc_id", 1)
    val snap = VersionedTable.snapshot(spark, root, 2)
    val withQ = snap.files.filter(_.stats.contains("quality"))
    assert(withQ.nonEmpty, "rewritten files must carry quality stats")
    assert(withQ.head.stats("quality") === ((0L, 18L)))
    // v1 (pre-evolution) still reads
    assert(VersionedTable.read(spark, root, Some(1)).count() === 40)
  }
}
