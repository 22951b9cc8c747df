package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Laws of per-file bloom filters: enrolled by the `bloom.cols` table
  * property, recorded on every write, NO false negatives (the
  * plan-side position projection and the driver-side lookup hash are
  * the same Catalyst expression), point-lookup pruning is strict and
  * answer-preserving on any layout, and pre-property history is
  * conservatively kept. */
class BloomSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_bloomspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"unique text $i", (i % 7).toLong))
      .toDF("doc_id", "text", "grp")
  }

  test("writes record blooms exactly for the property-enrolled " +
    "string/long columns; pre-property files have none and are " +
    "conservatively kept") {
    val root = freshRoot("enroll")
    VersionedTable.append(spark, root, docs(50), "doc_id", 2) // v1: no prop
    assert(VersionedTable.snapshot(spark, root, 1)
      .files.forall(_.blooms.isEmpty))
    VersionedTable.setProperty(spark, root,
      VersionedTable.BloomColsProp, "text, grp")
    VersionedTable.append(spark, root, docs(50)
      .withColumn("doc_id", col("doc_id") + 1000L), "doc_id", 2) // v3
    val snap = VersionedTable.snapshot(spark, root, 3)
    val (old, fresh) = snap.files.partition(_.blooms.isEmpty)
    assert(old.size === 2 && fresh.size === 2)
    fresh.foreach(f => assert(f.blooms.keySet === Set("text", "grp")))
    // lookup of a value living ONLY in the old files: the old files
    // are kept (no bloom = no claim), fresh files prune
    val kept = VersionedTable.bloomPrunedFiles(snap.files,
      Map("text" -> "no such value anywhere"))
    assert(kept.toSet === old.toSet,
      "bloom-less files must be kept, bloomed non-matching files pruned")
  }

  test("NO false negatives: every value present in a file passes that " +
    "file's bloom (driver hash == plan hash, pinned through data)") {
    val root = freshRoot("nofn")
    VersionedTable.setProperty(spark, root,
      VersionedTable.BloomColsProp, "text,grp")
    VersionedTable.append(spark, root, docs(200), "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    // for every row, the file that PHYSICALLY holds it must survive a
    // bloom lookup of its value — one pass collecting (file, value),
    // then the owning-file check driver-side for all 200 rows
    val pairs = spark.read.parquet(snap.files.map(_.path): _*)
      .select(input_file_name().as("f"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    pairs.foreach { case (f, v) =>
      val kept = VersionedTable.bloomPrunedFiles(snap.files,
        Map("text" -> v))
      assert(kept.exists(k =>
        VersionedTable.normPath(k.path) == VersionedTable.normPath(f)),
        s"false negative: '$v' pruned its own file")
    }
    // and the full read path agrees for a sample (Spark jobs)
    pairs.take(20).foreach { case (_, v) =>
      val got = VersionedTable.read(spark, root, eqs = Map("text" -> v))
        .filter(col("text") === v).count()
      assert(got === 1L, s"read-path false negative for '$v'")
    }
  }

  test("point-lookup pruning is strict on an UNCLUSTERED layout and " +
    "answer-preserving; long columns bloom too") {
    val root = freshRoot("strict")
    VersionedTable.setProperty(spark, root,
      VersionedTable.BloomColsProp, "text,grp")
    VersionedTable.append(spark, root, docs(800), "doc_id", 8)
    val snap = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    // 'unique text 7' lives in exactly one file; the layout is keyed,
    // NOT text-clustered — zone maps cannot skip here, blooms do
    val kept = VersionedTable.bloomPrunedFiles(snap.files,
      Map("text" -> "unique text 7"))
    assert(kept.size < snap.files.size,
      s"bloom prune must be strict, kept ${kept.size}")
    val got = VersionedTable.read(spark, root,
      eqs = Map("text" -> "unique text 7"))
      .filter(col("text") === "unique text 7")
    assert(got.count() === 1)
    assert(got.select(col("doc_id")).head.getLong(0) === 7L)
    // a long lookup composes with a string lookup (both must pass)
    val kept2 = VersionedTable.bloomPrunedFiles(snap.files,
      Map("text" -> "unique text 7", "grp" -> (7L % 7)))
    assert(kept2.size <= kept.size)
    // LONG bloom lookups are complete too (driver hash == plan hash
    // for LongType literals): the eqs read returns every matching row
    val expect = VersionedTable.read(spark, root)
      .filter(col("grp") === 3L).count()
    assert(expect > 0)
    assert(VersionedTable.read(spark, root, eqs = Map("grp" -> 3L))
      .filter(col("grp") === 3L).count() === expect,
      "long-column bloom pruning must never drop a matching row")
    // null lookups are rejected loudly, not silently all-pruned
    intercept[IllegalArgumentException] {
      VersionedTable.bloomPrunedFiles(snap.files, Map("text" -> null))
    }
  }

  test("blooms survive the manifest round-trip and rewrites: a " +
    "cluster rewrite under the property re-records them") {
    val root = freshRoot("rewrite")
    VersionedTable.setProperty(spark, root,
      VersionedTable.BloomColsProp, "text,grp")
    VersionedTable.append(spark, root, docs(100), "doc_id", 2)
    VersionedTable.optimizeClusterBy(spark, root, "grp", "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    assert(snap.op === "cluster")
    assert(snap.files.forall(_.blooms.contains("text")))
    val kept = VersionedTable.bloomPrunedFiles(snap.files,
      Map("text" -> "unique text 42"))
    assert(kept.size < snap.files.size)
    assert(VersionedTable.read(spark, root,
      eqs = Map("text" -> "unique text 42"))
      .filter(col("text") === "unique text 42").count() === 1)
  }
}
