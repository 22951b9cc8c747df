package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable
import graft.sources.v2.GraftSqlResolution

/** The SQL face: `graft.`/path`` identifiers through a path-based
  * TableCatalog, SQL VERSION AS OF / TIMESTAMP AS OF, and the
  * v2-relation -> V1 HadoopFsRelation swap (both through the injected
  * extension on a dedicated session, and via the manual rule
  * application library code uses on extension-free sessions). */
class GraftCatalogSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_catspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  private def docs(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
  }

  private def build(root: String): Unit = {
    VersionedTable.append(spark, root, docs(0 until 30), "doc_id", 2)
    VersionedTable.append(spark, root, docs(30 until 50), "doc_id", 2)
    ()
  }

  private def swapped(s: SparkSession, sql: String) =
    graft.sources.v2.GraftSql.sql(s, sql)

  test("SELECT through the catalog reads the head; VERSION AS OF " +
    "pins an old snapshot; filters keep manifest file-skipping") {
    val root = freshRoot("sel")
    build(root)
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.v2.GraftCatalog")
    assert(swapped(spark,
      s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) === 50L)
    assert(swapped(spark,
      s"SELECT count(*) AS n FROM graft.`$root` VERSION AS OF 1")
      .head().getLong(0) === 30L)
    // the swap serves the connector's FileIndex: a key-range filter
    // must scan fewer files than the snapshot holds (zone-map skip)
    val pruned = swapped(spark,
      s"SELECT * FROM graft.`$root` WHERE doc_id < 5")
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("expected a FileSourceScanExec after the swap"))
    assert(pruned.count() === 5)
    assert(scan.metrics("numFiles").value < 4)
  }

  test("TIMESTAMP AS OF resolves at-or-before through SQL micros") {
    val root = freshRoot("ts")
    build(root)
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.v2.GraftCatalog")
    val t1 = VersionedTable.snapshot(spark, root, 1).tsMillis
    val probe = java.time.Instant.ofEpochMilli(t1)
      .toString.replace("T", " ").replace("Z", "")
    assert(swapped(spark,
      s"SELECT count(*) AS n FROM graft.`$root` " +
        s"TIMESTAMP AS OF '$probe'").head().getLong(0) === 30L)
  }

  test("unknown tables and namespaced identifiers are rejected") {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.v2.GraftCatalog")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM graft.`${freshRoot("missing")}`")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.db.tbl")
    }
  }

  test("end to end in a child JVM whose FIRST session installs the " +
    "extension: spark.sql alone resolves, time-travels and prunes — " +
    "spark.sql.extensions is static, so only a fresh JVM proves it") {
    val root = freshRoot("ext")
    build(root)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", cp, "graft.SqlCatalogChild", root)).toIndexedSeq
    val p = new ProcessBuilder(cmd: _*).inheritIO().start()
    assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "SQL catalog child JVM did not finish in time")
    assert(p.exitValue() === 0, "SQL catalog child JVM failed")
  }
}
