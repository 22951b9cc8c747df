package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM half of GraftCatalogSpec's end-to-end test: the FIRST
  * session of this JVM installs `spark.sql.extensions` (a static conf
  * the parent test JVM can no longer set), so plain `spark.sql` over
  * the graft catalog must resolve, time-travel and file-skip with NO
  * manual rule application.  Exits non-zero on any failed check. */
object SqlCatalogChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.v2.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      def check(cond: Boolean, what: String): Unit =
        if (!cond) { System.err.println(s"FAILED: $what"); sys.exit(1) }
      check(s.sql(s"SELECT count(*) AS n FROM graft.`$root`")
        .head().getLong(0) == 50L, "head count via plain spark.sql")
      check(s.sql(
        s"SELECT count(*) AS n FROM graft.`$root` VERSION AS OF 1")
        .head().getLong(0) == 30L, "VERSION AS OF 1 count")
      check(s.sql(
        s"""SELECT count(*) AS n FROM graft.`$root` a
           |JOIN graft.`$root` VERSION AS OF 1 b USING (doc_id)"""
          .stripMargin).head().getLong(0) == 30L,
        "self-join across two pinned snapshots")
      // the swap must serve the connector's FileIndex: key filter
      // scans fewer files than the snapshot holds
      val pruned = s.sql(
        s"SELECT * FROM graft.`$root` WHERE doc_id < 5")
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      check(scan.isDefined, "expected FileSourceScanExec after swap")
      check(pruned.count() == 5L, "pruned read row count")
      check(scan.get.metrics("numFiles").value < 4,
        s"zone-map skip through SQL (numFiles = " +
          s"${scan.get.metrics("numFiles").value})")
    } finally s.stop()
  }
}
