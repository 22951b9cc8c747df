package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The two path normalizers — driver-side `normPath`
  * (Path.toUri.getPath) and plan-side `normPathCol` (a regexp over the
  * `_metadata.file_path` column) — MUST agree on every URI spelling a
  * store can produce.  merge/delete/deleteMoR compare plan-derived
  * `__graft_file` / DV `path` values against `normPath(f.path)`: a
  * disagreement on any spelling makes touched-file detection silently
  * match nothing (merges duplicate keys, deletes no-op, DV folds
  * resurrect rows) while every LOCAL-path test stays green — which is
  * exactly what happened before r11 on authority-bearing URIs
  * (hdfs://nn:port/..., s3a://bucket/...), where the old regexp kept
  * the authority as a path segment. */
class PathNormalizerSpec extends SparkSpec {

  test("normPathCol (plan side) and normPath (driver side) agree on " +
    "scheme-less, file:, file:///, and authority-bearing URI spellings") {
    import spark.implicits._
    val spellings = Seq(
      // the two local spellings Spark itself mixes (_metadata vs
      // input_file_name)
      "file:/tmp/graft/data/part-00000.parquet",
      "file:///tmp/graft/data/part-00000.parquet",
      // authority-bearing stores — the pre-r11 regression surface
      "hdfs://namenode:8020/warehouse/graft/data/part-00000.parquet",
      "s3a://corpus-bucket/warehouse/graft/data/part-00000.parquet",
      "abfs://container@acct.dfs.core.windows.net/graft/part-0.parquet",
      "gs://corpus-bucket/graft/data/part-00000.parquet",
      // already-normalized input must be a fixpoint
      "/tmp/graft/data/part-00000.parquet")
    val planSide = spellings.toDF("p")
      .select(VersionedTable.normPathCol(col("p")).as("n"))
      .as[String].collect().toSeq
    val driverSide = spellings.map(VersionedTable.normPath)
    assert(planSide === driverSide,
      s"normalizers disagree:\n plan   = $planSide\n driver = $driverSide")
    // and the agreed form is the bare absolute path
    assert(driverSide.forall(_.startsWith("/")))
    assert(driverSide.take(2).distinct.size === 1,
      "both local spellings must collapse to one identity")
  }
}
