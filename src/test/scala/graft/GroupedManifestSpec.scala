package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Laws of TWO-LEVEL manifests (`manifest.groupSize`): grouping
  * round-trips the exact file set, a small commit REUSES untouched
  * groups by reference (commit writes are O(touched groups), not
  * O(all files)), every lifecycle op keeps working over grouped
  * snapshots, and vacuum garbage-collects unreferenced group
  * sidecars without ever breaking a kept or cloned snapshot. */
class GroupedManifestSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_grpspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"t$i", (i % 9).toLong))
      .toDF("doc_id", "text", "score")
  }

  private def grouped(kind: String, n: Int, files: Int,
      size: Int): String = {
    val root = freshRoot(kind)
    VersionedTable.setProperty(spark, root,
      VersionedTable.ManifestGroupSizeProp, size.toString)
    VersionedTable.append(spark, root, docs(n), "doc_id", files)
    root
  }

  test("grouping round-trips the exact file set: snapshot.files under " +
    "groups equals the ungrouped listing, and reads are identical") {
    val root = grouped("roundtrip", 160, 16, 4)
    val snap = VersionedTable.snapshot(spark, root, 2)
    assert(snap.groups.size === 4 && snap.groups.forall(_._1.n == 4))
    assert(snap.files.size === 16)
    // group aggregates match their entries
    snap.groups.foreach { case (ref, entries) =>
      assert(ref.rows === entries.map(_.liveRows).sum)
      assert(ref.minId === entries.map(_.minId).min)
      assert(ref.maxId === entries.map(_.maxId).max)
    }
    assert(VersionedTable.read(spark, root).count() === 160)
    // the ROOT manifest itself lists refs, not entries (loose empty)
    assert(snap.files.toSet === snap.groups.flatMap(_._2).toSet)
  }

  test("a small merge REUSES untouched groups by reference and " +
    "rewrites only the touched one; answers stay exact") {
    import spark.implicits._
    val root = grouped("reuse", 160, 16, 4)
    val before = VersionedTable.snapshot(spark, root, 2)
    VersionedTable.merge(spark, root,
      Seq((0L, "edited", 100L)).toDF("doc_id", "text", "score"),
      "doc_id", 1)
    val after = VersionedTable.snapshot(spark, root, 3)
    val reused = after.groups.map(_._1.path).toSet
      .intersect(before.groups.map(_._1.path).toSet)
    assert(reused.size === 3,
      s"3 of 4 groups must carry by reference, got ${reused.size}")
    assert(after.files.size === 16)
    assert(VersionedTable.read(spark, root).count() === 160)
    assert(VersionedTable.read(spark, root)
      .filter(col("text") === "edited").count() === 1)
    // time travel across the grouping boundary still resolves
    assert(VersionedTable.read(spark, root, Some(2)).count() === 160)
    assert(VersionedTable.read(spark, root, Some(2))
      .filter(col("text") === "edited").count() === 0)
  }

  test("deletes, MoR deletes, change feeds and restore work over " +
    "grouped snapshots") {
    val root = grouped("ops", 160, 16, 4)
    // ids 0..3 live in ONE file (one group): a DV on it must rewrite
    // exactly that group and carry the other three by reference
    VersionedTable.deleteMoR(spark, root, col("doc_id") < 4, "doc_id")
    assert(VersionedTable.read(spark, root).count() === 156)
    val v2 = VersionedTable.snapshot(spark, root, 2)
    val v3 = VersionedTable.snapshot(spark, root, 3)
    assert(v3.groups.map(_._1.path).toSet
      .intersect(v2.groups.map(_._1.path).toSet).size === 3,
      "a one-file DV must reuse the three untouched groups")
    val feed = VersionedTable.changeFeed(spark, root, 2, 3)
    assert(feed.filter(col("_change_type") === "delete").count() === 4)
    VersionedTable.delete(spark, root, col("doc_id") === 10L, "doc_id", 1)
    assert(VersionedTable.read(spark, root).count() === 155)
    VersionedTable.restore(spark, root, 2)
    assert(VersionedTable.read(spark, root).count() === 160)
  }

  test("GROUP-LEVEL pruning: a key-sliced read resolves only the " +
    "intersecting group sidecars — proven by deleting the others " +
    "from disk and reading the slice anyway") {
    val root = grouped("gprune", 160, 16, 4)
    // refs straight from the manifest JSON — resolving via snapshot()
    // here would cache every group and mask a broken pruner
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(
      s"$root/_versions/v000002.json"))
    val node = try new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(in) finally in.close()
    val gn = node.get("groups")
    val refs = (0 until gn.size()).map { i =>
      val g = gn.get(i)
      (g.get("path").asText(), g.get("minId").asLong(),
        g.get("maxId").asLong())
    }
    // the slice [0, 9] intersects exactly one group; physically
    // DELETE every other group's sidecar — an eager resolver crashes
    val (touch, others) = refs.partition { case (_, mn, mx) =>
      mx >= 0L && mn <= 9L }
    assert(touch.size === 1 && others.size === 3)
    others.foreach { case (p, _, _) =>
      fs.delete(new org.apache.hadoop.fs.Path(p), false) }
    // the sliced read works end-to-end (read() routes an idRange on
    // an uncached snapshot through snapshotPruned)
    assert(VersionedTable.read(spark, root, idRange = Some((0L, 9L)))
      .filter(col("doc_id") <= 9L).count() === 10)
    val pruned = VersionedTable.snapshotPruned(spark, root, 2, 0L, 9L)
    assert(pruned.groups.size === 1 &&
      pruned.files.forall(f => f.maxId >= 0L && f.minId <= 9L))
    // and the FULL resolution really would have needed the deleted
    // sidecars — the pruner demonstrably never opened them
    intercept[java.io.FileNotFoundException] {
      VersionedTable.snapshot(spark, root, 2)
    }
  }

  test("vacuum GCs group sidecars referenced by no kept manifest and " +
    "keeps the referenced ones; clones survive a source vacuum") {
    val root = grouped("gc", 160, 16, 4)
    // three churn commits, each rewriting one group
    import spark.implicits._
    (1 to 3).foreach { k =>
      VersionedTable.merge(spark, root,
        Seq((k.toLong, s"e$k", 0L)).toDF("doc_id", "text", "score"),
        "doc_id", 1)
    }
    val clone = freshRoot("gc_clone")
    VersionedTable.cloneShallow(spark, root, clone)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)
    val gdir = new org.apache.hadoop.fs.Path(s"$root/_versions/_groups")
    val beforeGc = fs.listStatus(gdir).count(_.getPath.getName
      .startsWith("g-"))
    VersionedTable.vacuum(spark, root, keepFrom = 5, retainMs = 0)
    val afterGc = fs.listStatus(gdir).count(_.getPath.getName
      .startsWith("g-"))
    assert(afterGc < beforeGc, "dropped versions' groups must GC")
    // the head still reads, and every kept group resolves
    assert(VersionedTable.read(spark, root).count() === 160)
    // the clone (which re-grouped under its own root) is untouched
    assert(VersionedTable.read(spark, clone).count() === 160)
  }

  test("the two-level layout AUTO-ENABLES once a snapshot crosses the " +
    "file-count threshold (no property needed); manifest.groupSize=0 " +
    "pins single-level explicitly") {
    val root = freshRoot("auto")
    val prevT = VersionedTable.AutoGroupFileThreshold
    val prevS = VersionedTable.AutoGroupSize
    VersionedTable.AutoGroupFileThreshold = 8
    VersionedTable.AutoGroupSize = 4
    try {
      // below the threshold: classic single-level, zero group files
      VersionedTable.append(spark, root, docs(20), "doc_id", 4)
      assert(VersionedTable.snapshot(spark, root, 1).groups.isEmpty)
      // the next append pushes the snapshot to 10 files >= 8: the
      // commit groups WITHOUT any property having been set
      VersionedTable.append(spark, root,
        docs(20).withColumn("doc_id", col("doc_id") + 1000L),
        "doc_id", 6)
      val snap = VersionedTable.snapshot(spark, root, 2)
      assert(snap.groups.nonEmpty,
        "auto-enable must group past the threshold")
      assert(snap.files.size === 10)
      // 10 files at size 4 -> 2 full groups + 2 loose root entries,
      // and the grouped entries are a subset of the exact file set
      assert(snap.groups.size === 2)
      assert(snap.groups.flatMap(_._2).toSet.subsetOf(snap.files.toSet))
      assert(VersionedTable.read(spark, root).count() === 40)
      // HYSTERESIS: a grouped lineage stays grouped down to HALF the
      // threshold (an overwrite to 5 files: 5 < 8 but >= 4), so a
      // file count oscillating around the boundary cannot flip the
      // layout — and pay the full re-pack — on every commit
      VersionedTable.overwrite(spark, root,
        docs(20).withColumn("doc_id", col("doc_id") + 3000L)
          .repartitionByRange(5, col("doc_id")), "doc_id", 5)
      val hys = VersionedTable.snapshot(spark, root,
        VersionedTable.latestVersion(spark, root).get)
      assert(hys.files.size === 5 && hys.groups.nonEmpty,
        "a grouped lineage must stay grouped above half the threshold")
      // below half the threshold the layout drops back to single-level
      VersionedTable.overwrite(spark, root,
        docs(8).withColumn("doc_id", col("doc_id") + 4000L),
        "doc_id", 2)
      val low = VersionedTable.snapshot(spark, root,
        VersionedTable.latestVersion(spark, root).get)
      assert(low.files.size === 2 && low.groups.isEmpty)
      // refill above the threshold before the explicit-0 pin check
      VersionedTable.append(spark, root,
        docs(40).withColumn("doc_id", col("doc_id") + 5000L),
        "doc_id", 8)
      assert(VersionedTable.snapshot(spark, root,
        VersionedTable.latestVersion(spark, root).get).groups.nonEmpty)
      // explicit 0 pins single-level even above the threshold
      VersionedTable.setProperty(spark, root,
        VersionedTable.ManifestGroupSizeProp, "0")
      VersionedTable.append(spark, root,
        docs(5).withColumn("doc_id", col("doc_id") + 2000L),
        "doc_id", 1)
      val pinned = VersionedTable.snapshot(spark, root,
        VersionedTable.latestVersion(spark, root).get)
      assert(pinned.groups.isEmpty,
        "manifest.groupSize=0 must pin the single-level layout")
      assert(VersionedTable.read(spark, root).count() === 53)
    } finally {
      VersionedTable.AutoGroupFileThreshold = prevT
      VersionedTable.AutoGroupSize = prevS
    }
  }
}
