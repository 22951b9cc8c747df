package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Laws of the DataFrameReader-shaped option surface: TIMESTAMP AS OF
  * resolves the latest commit at-or-before the probe, option conflicts
  * and misspellings throw, and the surface is a pure router (same
  * rows as the library calls it resolves to). */
class ReaderOptionsSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_ropts_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  test("timestampAsOf resolves the latest version committed at or " +
    "before the probe; probes before the first commit throw") {
    import spark.implicits._
    val root = freshRoot("tsasof")
    VersionedTable.append(spark, root,
      (0L until 10L).map(i => (i, s"t$i")).toDF("doc_id", "text"),
      "doc_id", 2, op = "load")
    val t1 = VersionedTable.snapshot(spark, root, 1).tsMillis
    Thread.sleep(5) // commit clocks must differ for the law to bite
    VersionedTable.merge(spark, root,
      (10L until 15L).map(i => (i, s"u$i")).toDF("doc_id", "text"),
      "doc_id", 2)
    val t2 = VersionedTable.snapshot(spark, root, 2).tsMillis
    assert(t1 > 0 && t2 > t1)
    // at t1 exactly: v1 (at-or-before); at t2: v2; between: v1
    assert(VersionedTable.readOptions(spark, root,
      Map("timestampAsOf" -> t1.toString)).count() === 10)
    assert(VersionedTable.readOptions(spark, root,
      Map("timestampAsOf" -> t2.toString)).count() === 15)
    assert(VersionedTable.readOptions(spark, root,
      Map("timestampAsOf" -> (t2 - 1).toString)).count() === 10)
    // ISO-8601 spelling resolves too (far future = head)
    assert(VersionedTable.readOptions(spark, root,
      Map("timestampAsOf" -> "2100-01-01T00:00:00Z")).count() === 15)
    // before the first commit: the table cannot reconstruct that state
    intercept[IllegalArgumentException] {
      VersionedTable.readOptions(spark, root,
        Map("timestampAsOf" -> (t1 - 1000).toString))
    }
  }

  test("option conflicts and misspellings throw instead of silently " +
    "reading the wrong snapshot") {
    import spark.implicits._
    val root = freshRoot("optguard")
    VersionedTable.append(spark, root,
      (0L until 5L).map(i => (i, s"t$i")).toDF("doc_id", "text"),
      "doc_id", 1, op = "load")
    intercept[IllegalArgumentException] {
      VersionedTable.readOptions(spark, root,
        Map("versionAsOf" -> "1", "timestampAsOf" -> "0"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.readOptions(spark, root, Map("versionAsof" -> "1"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.readOptions(spark, root,
        Map("readChangeFeed" -> "true", "startingVersion" -> "1",
          "timestampAsOf" -> "0"))
    }
  }

  test("restoreToTimestamp rolls back to the latest commit at or " +
    "before the probe") {
    import spark.implicits._
    val root = freshRoot("restorets")
    def batch(r: Range) =
      r.map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    VersionedTable.append(spark, root, batch(0 until 4), "doc_id", 1,
      op = "load")
    VersionedTable.append(spark, root, batch(4 until 9), "doc_id", 1)
    val t1 = VersionedTable.snapshot(spark, root, 1).tsMillis
    VersionedTable.restoreToTimestamp(spark, root, t1.toString)
    assert(VersionedTable.read(spark, root).count() === 4)
    assert(VersionedTable.snapshot(spark, root,
      VersionedTable.latestVersion(spark, root).get).op === "restore")
  }

  test("CDF timestamp bounds: startingTimestamp = first commit at or " +
    "after, endingTimestamp = last commit at or before; mixing a " +
    "bound's version and timestamp forms throws") {
    import spark.implicits._
    val root = freshRoot("cdfts")
    def batch(r: Range) =
      r.map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    VersionedTable.append(spark, root, batch(0 until 4), "doc_id", 1,
      op = "load")
    VersionedTable.append(spark, root, batch(4 until 9), "doc_id", 1)
    VersionedTable.append(spark, root, batch(9 until 15), "doc_id", 1)
    val t2 = VersionedTable.snapshot(spark, root, 2).tsMillis
    val got = VersionedTable.readOptions(spark, root, Map(
        "readChangeFeed" -> "true",
        "startingTimestamp" -> t2.toString,
        "endingTimestamp" -> t2.toString))
    assert(got.count() === 5) // exactly v2's feed
    assert(got.select("_commit_version").distinct().head().getInt(0) === 2)
    intercept[IllegalArgumentException] {
      VersionedTable.readOptions(spark, root, Map(
        "readChangeFeed" -> "true", "startingVersion" -> "1",
        "startingTimestamp" -> t2.toString))
    }
    intercept[IllegalArgumentException] { // beyond the last commit
      VersionedTable.readOptions(spark, root, Map(
        "readChangeFeed" -> "true",
        "startingTimestamp" -> (System.currentTimeMillis() +
          3600000L).toString))
    }
  }
}
