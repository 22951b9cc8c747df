package graft

import org.apache.spark.sql.functions._

/** The _metadata hidden column: per-row file provenance (path, size,
  * modification time) served from the scan itself — what a 100 TB
  * layout audit uses to find small-file problems and size shuffle
  * partitions without a separate listing job. */
class MetadataColumnSpec extends SparkSpec {

  test("_metadata file provenance matches the filesystem; partition " +
    "sizing advice derives from it") {
    val path = s"$sfDir/lineitem.parquet"
    val df = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("fp"),
        col("_metadata.file_size").as("fs"))
    val files = df.select(col("fp"), col("fs")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(files.length === 1)
    val (fp, fs) = files.head
    assert(fp.endsWith("lineitem.parquet"))
    assert(fs === new java.io.File(path).length())
    // every row carries its file's provenance
    assert(df.filter(col("fs") =!= fs).count() === 0L)
    // the sizing arithmetic a layout audit derives from _metadata:
    // ceil(total bytes / 128 MiB target) partitions, floor 1
    val advice = df.groupBy(col("fp"))
      .agg(max(col("fs")).as("bytes"))
      .agg(sum(col("bytes")).as("total"),
        greatest(lit(1L),
          expr("cast(ceil(sum(bytes) / (128 * 1024 * 1024)) AS bigint)"))
          .as("recommended_partitions"))
      .collect().head
    assert(advice.getLong(0) === fs)
    assert(advice.getLong(1) === 1L) // 1 MB fixture -> one partition
  }
}
