package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Laws of table properties and CHECK constraints: versioned metadata
  * riding the manifest, validated against existing data when added,
  * enforced on every row-adding write (append, merge, and everything
  * routed through them), SQL-standard NULL semantics, head-lineage
  * policy through restore, inheritance through clone. */
class ConstraintSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_consspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def docs(n: Int, scoreOf: Int => java.lang.Long = i => i.toLong) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"t$i", scoreOf(i)))
      .toDF("doc_id", "text", "score")
  }

  test("addConstraint validates EXISTING rows: a violating table " +
    "rejects the constraint and commits nothing") {
    val root = freshRoot("addval")
    VersionedTable.append(spark, root, docs(20), "doc_id", 2)
    val ex = intercept[IllegalStateException] {
      VersionedTable.addConstraint(spark, root, "small", "score < 10")
    }
    assert(ex.getMessage.contains("small") &&
      ex.getMessage.contains("10 rows"))
    // nothing committed: head is still v1, no constraint
    assert(VersionedTable.latestVersion(spark, root) === Some(1))
    assert(VersionedTable.constraints(spark, root).isEmpty)
    // a satisfiable one lands as a new version with the files carried
    val v = VersionedTable.addConstraint(spark, root, "nonneg",
      "score >= 0")
    assert(v === 2)
    assert(VersionedTable.constraints(spark, root) ===
      Map("nonneg" -> "score >= 0"))
    assert(VersionedTable.read(spark, root).count() === 20)
  }

  test("append and merge REJECT violating batches with per-constraint " +
    "counts; valid batches pass; drop lifts enforcement") {
    val root = freshRoot("enforce")
    VersionedTable.append(spark, root, docs(10), "doc_id", 2)
    VersionedTable.addConstraint(spark, root, "nonneg", "score >= 0")
    // violating append: rejected, table unchanged
    val bad = docs(4, i => (-1 - i).toLong)
    val ex = intercept[IllegalStateException] {
      VersionedTable.append(spark, root, bad, "doc_id", 1)
    }
    assert(ex.getMessage.contains("nonneg") &&
      ex.getMessage.contains("4 rows"))
    assert(VersionedTable.read(spark, root).count() === 10)
    // violating merge: rejected too (CDC/streaming route through merge)
    intercept[IllegalStateException] {
      VersionedTable.merge(spark, root,
        docs(3, _ => -5L), "doc_id", 1)
    }
    assert(VersionedTable.read(spark, root).count() === 10)
    // valid writes pass through both paths
    import spark.implicits._
    VersionedTable.append(spark, root,
      Seq((100L, "new", 7L)).toDF("doc_id", "text", "score"), "doc_id", 1)
    VersionedTable.merge(spark, root,
      Seq((0L, "upd", 9L)).toDF("doc_id", "text", "score"), "doc_id", 1)
    assert(VersionedTable.read(spark, root).count() === 11)
    assert(VersionedTable.read(spark, root)
      .filter(col("score") < 0).count() === 0)
    // drop: the formerly-violating batch is admitted
    VersionedTable.dropConstraint(spark, root, "nonneg")
    VersionedTable.append(spark, root, bad, "doc_id", 1)
    assert(VersionedTable.read(spark, root)
      .filter(col("score") < 0).count() === 4)
  }

  test("SQL-standard NULL semantics: an unknown predicate PASSES, so " +
    "NOT NULL is spelled explicitly and then enforced") {
    val root = freshRoot("nulls")
    VersionedTable.append(spark, root, docs(5), "doc_id", 1)
    VersionedTable.addConstraint(spark, root, "pos", "score >= 0")
    // null score: `score >= 0` is UNKNOWN -> passes (CHECK semantics)
    VersionedTable.append(spark, root, docs(2, _ => null), "doc_id", 1)
    assert(VersionedTable.read(spark, root).count() === 7)
    // an explicit NOT NULL constraint then rejects nulls
    intercept[IllegalStateException] {
      VersionedTable.addConstraint(spark, root, "scorenn",
        "score IS NOT NULL") // existing nulls violate at add time
    }
    VersionedTable.delete(spark, root, col("score").isNull, "doc_id", 1)
    VersionedTable.addConstraint(spark, root, "scorenn",
      "score IS NOT NULL")
    intercept[IllegalStateException] {
      VersionedTable.append(spark, root, docs(1, _ => null), "doc_id", 1)
    }
  }

  test("a constraint on an EVOLUTION-ADDED column: batches not " +
    "carrying the column pass (their rows read it as NULL), batches " +
    "carrying violations still fail") {
    import spark.implicits._
    val root = freshRoot("evocons")
    VersionedTable.append(spark, root, docs(10), "doc_id", 2)
    // evolve: add `quality`, then constrain it
    VersionedTable.merge(spark, root,
      Seq((0L, "e", 1L, 5L)).toDF("doc_id", "text", "score", "quality"),
      "doc_id", 1)
    VersionedTable.addConstraint(spark, root, "qpos", "quality >= 0")
    // a pre-evolution-shaped batch (no quality column): its rows land
    // with quality = NULL -> UNKNOWN -> passes, like Delta
    VersionedTable.append(spark, root,
      docs(3).withColumn("doc_id", col("doc_id") + 100L), "doc_id", 1)
    assert(VersionedTable.read(spark, root).count() === 13)
    // a batch CARRYING a violation still fails
    intercept[IllegalStateException] {
      VersionedTable.append(spark, root,
        Seq((200L, "bad", 1L, -1L))
          .toDF("doc_id", "text", "score", "quality"), "doc_id", 1)
    }
    assert(VersionedTable.read(spark, root).count() === 13)
  }

  test("constraints are VERSIONED metadata: time travel sees the old " +
    "set, restore keeps head policy (content rolls back, policy " +
    "does not), clones inherit the source's set") {
    val root = freshRoot("lineage")
    VersionedTable.append(spark, root, docs(10), "doc_id", 2) // v1
    VersionedTable.addConstraint(spark, root, "nonneg", "score >= 0") // v2
    VersionedTable.setProperty(spark, root, "owner", "curation") // v3
    assert(VersionedTable.snapshot(spark, root, 1).constraints.isEmpty)
    val p3 = VersionedTable.snapshot(spark, root, 3).props
    assert(p3("constraint.nonneg") === "score >= 0")
    assert(p3("owner") === "curation")
    assert(p3("table.key") === "doc_id") // self-recorded by append
    assert(p3.contains("table.schema")) // self-recorded schema JSON
    assert(p3("format.version") === "1") // stamped by every commit
    assert(p3.size === 5, s"unexpected extra props: ${p3.keySet}")
    // restore to v1: content of v1, but the constraint STAYS in force
    VersionedTable.restore(spark, root, 1) // v4
    assert(VersionedTable.read(spark, root).count() === 10)
    assert(VersionedTable.constraints(spark, root) ===
      Map("nonneg" -> "score >= 0"))
    intercept[IllegalStateException] {
      VersionedTable.append(spark, root, docs(1, _ => -1L), "doc_id", 1)
    }
    // clone: policy travels with the data
    val cl = freshRoot("lineage_clone")
    VersionedTable.cloneShallow(spark, root, cl)
    assert(VersionedTable.constraints(spark, cl) ===
      Map("nonneg" -> "score >= 0"))
    intercept[IllegalStateException] {
      VersionedTable.append(spark, cl, docs(1, _ => -1L), "doc_id", 1)
    }
    // reserved namespace is fenced off from raw property writes
    intercept[IllegalArgumentException] {
      VersionedTable.setProperty(spark, root, "constraint.x", "1=1")
    }
  }

  test("history(): one audit row per version with op, counts and " +
    "constraint cardinality; commit timestamps are present and " +
    "non-decreasing") {
    val root = freshRoot("history")
    VersionedTable.append(spark, root, docs(10), "doc_id", 2)
    VersionedTable.addConstraint(spark, root, "nonneg", "score >= 0")
    VersionedTable.merge(spark, root, docs(2, _ => 1L), "doc_id", 1)
    val h = VersionedTable.history(spark, root)
      .orderBy(col("version")).collect()
    assert(h.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(h.map(_.getString(2)).toSeq ===
      Seq("append", "set-constraint", "merge"))
    assert(h.map(_.getLong(5)).toSeq === Seq(10L, 10L, 10L))
    assert(h.map(_.getLong(6)).toSeq === Seq(0L, 1L, 1L))
    val ts = h.map(_.getTimestamp(1))
    assert(ts.forall(_ != null))
    assert(ts.sliding(2).forall {
      case Array(a, b) => !b.before(a); case _ => true })
  }

  test("detail(): one manifest-only row about the head — counts, " +
    "recorded bytes, key, groups, constraints") {
    val root = freshRoot("detail")
    VersionedTable.setProperty(spark, root,
      VersionedTable.ManifestGroupSizeProp, "2")
    VersionedTable.append(spark, root, docs(40), "doc_id", 4)
    VersionedTable.addConstraint(spark, root, "nonneg", "score >= 0")
    val d = VersionedTable.detail(spark, root).collect().head
    assert(d.getAs[String]("op") === "set-constraint")
    assert(d.getAs[Long]("num_files") === 4L)
    assert(d.getAs[Long]("num_live_rows") === 40L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[String]("key_col") === "doc_id")
    assert(d.getAs[Long]("num_groups") === 2L)
    assert(d.getAs[Long]("num_constraints") === 1L)
  }

  test("vacuumRetain reclaims history past the horizon but always " +
    "keeps the head; kept snapshots stay readable") {
    val root = freshRoot("retain")
    VersionedTable.append(spark, root, docs(10), "doc_id", 2) // v1
    VersionedTable.merge(spark, root, docs(2, _ => 1L), "doc_id", 1) // v2
    VersionedTable.merge(spark, root, docs(2, _ => 2L), "doc_id", 1) // v3
    // everything is younger than an hour: nothing reclaimed
    VersionedTable.vacuumRetain(spark, root, 3600L * 1000, retainMs = 0)
    assert(VersionedTable.versions(spark, root) === Seq(1, 2, 3))
    // horizon in the future: all manifests are "old", head survives
    VersionedTable.vacuumRetain(spark, root, -3600L * 1000, retainMs = 0)
    assert(VersionedTable.versions(spark, root) === Seq(3))
    assert(VersionedTable.read(spark, root).count() === 10)
  }
}
