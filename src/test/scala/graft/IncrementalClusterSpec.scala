package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** optimizeClusterIncremental: O(overlapping files) layout
  * maintenance — component detection on manifest bounds, disjointness
  * post-condition, carry-by-reference of the already-clustered
  * remainder, idempotence, the unbounded-file degradation, and DV
  * interplay. */
class IncrementalClusterSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_incl_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  /** rows keyed by id with a `v` cluster column equal to id (so range
    * layout on v is fully controllable through id ranges). */
  private def rows(r: Range, vOf: Int => Long = _.toLong) = {
    import spark.implicits._
    r.map(i => (i.toLong, vOf(i), s"t$i")).toDF("id", "v", "text")
  }

  private def vRanges(root: String): Seq[(Long, Long)] = {
    val v = VersionedTable.latestVersion(spark, root).get
    VersionedTable.snapshot(spark, root, v).files
      .flatMap(_.stats.get("v")).sortBy(_._1)
  }

  private def disjoint(rs: Seq[(Long, Long)]): Boolean =
    rs.sliding(2).forall {
      case Seq((_, h1), (l2, _)) => l2 > h1
      case _ => true
    }

  test("an appended batch overlapping one resident range re-clusters " +
    "ONLY that component; the rest carries by reference; the layout " +
    "is disjoint after and the read is row-identical") {
    val root = freshRoot("steady")
    VersionedTable.append(spark, root, rows(0 until 400), "id", 4)
    VersionedTable.optimizeClusterBy(spark, root, "v", "id", 4)
    val clustered = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(disjoint(vRanges(root)))
    val before = VersionedTable.read(spark, root)
      .orderBy("id").collect()
    // batch keyed far away but with v inside the FIRST quartile only
    VersionedTable.append(spark, root,
      rows(10000 until 10020, i => (i % 90).toLong), "id", 1)
    val v4 = VersionedTable.optimizeClusterIncremental(spark, root,
      "v", "id", targetRowsPerFile = 200L)
    val after = VersionedTable.snapshot(spark, root, v4)
    assert(after.op === "cluster")
    // the three untouched quartile files carried by reference
    val carried = clustered.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet)
    assert(carried.size === 3,
      s"expected 3 carried files, got ${carried.size}")
    assert(disjoint(vRanges(root)))
    val got = VersionedTable.read(spark, root)
      .filter(col("id") < 10000).orderBy("id").collect()
    assert(got === before)
    assert(VersionedTable.read(spark, root).count() === 420)
  }

  test("idempotent on a disjoint layout: no commit, parent version " +
    "returned") {
    val root = freshRoot("idem")
    VersionedTable.append(spark, root, rows(0 until 100), "id", 2)
    VersionedTable.optimizeClusterBy(spark, root, "v", "id", 2)
    val v = VersionedTable.latestVersion(spark, root).get
    assert(VersionedTable.optimizeClusterIncremental(spark, root,
      "v", "id") === v)
    assert(VersionedTable.latestVersion(spark, root) === Some(v))
  }

  test("a file with no recorded bound for the cluster column degrades " +
    "to one full rewrite (it could overlap anything)") {
    import spark.implicits._
    val root = freshRoot("nullv")
    VersionedTable.append(spark, root, rows(0 until 100), "id", 2)
    VersionedTable.optimizeClusterBy(spark, root, "v", "id", 2)
    val clustered = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    // all-null v: writeFiles records no stats entry for it
    VersionedTable.append(spark, root,
      Seq((5000L, Option.empty[Long], "x"))
        .toDF("id", "v", "text"), "id", 1)
    val v4 = VersionedTable.optimizeClusterIncremental(spark, root,
      "v", "id", targetRowsPerFile = 1000L)
    val after = VersionedTable.snapshot(spark, root, v4)
    assert(clustered.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet).isEmpty,
      "expected a full rewrite when a file has unbounded range")
    assert(VersionedTable.read(spark, root).count() === 101)
  }

  test("optimizeBySize bin-packs sub-threshold files from recorded " +
    "sizes, carries big and unknown-size files, is row-preserving " +
    "and idempotent") {
    val root = freshRoot("bysize")
    // one big-ish commit and a trickle of tiny ones
    VersionedTable.append(spark, root, rows(0 until 2000), "id", 1)
    (0 until 4).foreach { i =>
      VersionedTable.append(spark, root,
        rows(3000 + i * 10 until 3000 + i * 10 + 10), "id", 1)
    }
    val before = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(before.files.size === 5)
    val bigBytes = before.files.map(_.bytes).max
    val rowsBefore = VersionedTable.read(spark, root)
      .orderBy("id").collect()
    // threshold below the big file: only the 4 tiny ones pack
    val v = VersionedTable.optimizeBySize(spark, root,
      minBytes = bigBytes, idCol = "id", targetBytes = Long.MaxValue)
    val after = VersionedTable.snapshot(spark, root, v)
    assert(after.op === "optimize")
    assert(after.files.size === 2) // big carried + one packed file
    assert(after.files.map(_.path).toSet
      .intersect(before.files.map(_.path).toSet).size === 1)
    assert(VersionedTable.read(spark, root).orderBy("id").collect()
      === rowsBefore)
    // idempotent: one small file left is not worth a rewrite
    assert(VersionedTable.optimizeBySize(spark, root, bigBytes, "id",
      Long.MaxValue) === v)
  }

  test("deletion vectors: rewritten components materialize their " +
    "masks, carried files keep them; read identity holds") {
    val root = freshRoot("dv")
    VersionedTable.append(spark, root, rows(0 until 400), "id", 4)
    VersionedTable.optimizeClusterBy(spark, root, "v", "id", 4)
    // masks in both a to-be-rewritten file (low v) and a carried one
    VersionedTable.deleteMoR(spark, root,
      col("id") === 10 || col("id") === 390, "id")
    val before = VersionedTable.read(spark, root).orderBy("id").collect()
    VersionedTable.append(spark, root,
      rows(10000 until 10010, i => (i % 50).toLong), "id", 1)
    val v = VersionedTable.optimizeClusterIncremental(spark, root,
      "v", "id", targetRowsPerFile = 500L)
    val after = VersionedTable.snapshot(spark, root, v)
    // the carried high-range file still wears its mask
    assert(after.files.exists(_.dv.isDefined))
    val got = VersionedTable.read(spark, root)
      .filter(col("id") < 10000).orderBy("id").collect()
    assert(got === before)
  }
}
