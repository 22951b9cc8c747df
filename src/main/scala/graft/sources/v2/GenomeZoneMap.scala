package graft.sources.v2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources._

/** Sidecar zone map for the genome DSv2 source: per-file min/max/rows
  * of the numeric `gene_count` field, written as `_zonemap.json` next
  * to the shards (the underscore prefix keeps it out of every data
  * listing, matching Spark's own `_`-file convention).  With the
  * sidecar present, [[GenomeScanBuilder.planInputPartitions]] skips
  * WHOLE FILES whose value range cannot satisfy the pushed filters —
  * the file-level analog of parquet row-group statistics, and the
  * mechanism behind every "data skipping index" at 100 TB: the scan
  * plans only the shards the predicate can touch, and the row-level
  * pushdown inside the reader stays as the exact second line of
  * defense (so skipping is purely an optimization, never a semantics
  * change).
  */
object GenomeZoneMap {

  final case class FileStats(min: Long, max: Long, rows: Long)

  val SidecarName = "_zonemap.json"

  /** Build the sidecar with a distributed pass: one task per shard
    * computes (min, max, rows) of gene_count; only the per-file stats
    * rows — bounded metadata, not data — come back to the driver. */
  def write(spark: SparkSession, dir: String): Unit = {
    val hPath = new Path(dir)
    val fs = FileSystem.get(hPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath).filter(_.isFile)
      .map(_.getPath.toString)
      .filterNot(f => f.contains("/_") || f.contains("/."))
      .toSeq.sorted
    val stats = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .map { f =>
        val mapper = new ObjectMapper()
        val p = new Path(f)
        val pfs = FileSystem.get(p.toUri,
          new org.apache.hadoop.conf.Configuration())
        val lines = new java.io.BufferedReader(
          new java.io.InputStreamReader(pfs.open(p), "UTF-8"))
        var mn = Long.MaxValue; var mx = Long.MinValue; var rows = 0L
        var line = lines.readLine()
        while (line != null) {
          if (line.trim.length > 2) {
            try {
              val node = mapper.readTree(line)
              if (node != null && node.isObject) {
                rows += 1
                val g = node.get("gene_count")
                if (g != null && g.canConvertToLong) {
                  val v = g.asLong()
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                }
              }
            } catch { case _: Exception => () }
          }
          line = lines.readLine()
        }
        lines.close()
        (p.getName, mn, mx, rows)
      }.collect()
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    stats.foreach { case (name, mn, mx, rows) =>
      val o = root.putObject(name)
      o.put("min", mn); o.put("max", mx); o.put("rows", rows)
    }
    val out = fs.create(new Path(hPath, SidecarName), true)
    out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    out.close()
  }

  /** Load the sidecar if present (keyed by shard basename). */
  def load(fs: FileSystem, dir: Path): Option[Map[String, FileStats]] = {
    val p = new Path(dir, SidecarName)
    if (!fs.exists(p)) None
    else {
      val mapper = new ObjectMapper()
      val in = fs.open(p)
      val node =
        try mapper.readTree(in)
        finally in.close()
      val it = node.fieldNames()
      val b = Map.newBuilder[String, FileStats]
      while (it.hasNext) {
        val k = it.next()
        val o = node.get(k)
        b += k -> FileStats(o.get("min").asLong(), o.get("max").asLong(),
          o.get("rows").asLong())
      }
      Some(b.result())
    }
  }

  /** Can ANY row in [min, max] satisfy every pushed gene_count filter?
    * Filters on other columns are ignored (the reader still applies
    * them row-level).  A file with zero non-null gene_count values has
    * the empty range (min > max), which correctly fails every
    * comparison filter and passes untouched when none is pushed. */
  def mightMatch(pushed: Array[Filter], s: FileStats): Boolean = {
    def lv(v: Any): Long = v.asInstanceOf[Number].longValue()
    pushed.forall {
      case GreaterThan("gene_count", v) => s.max > lv(v)
      case GreaterThanOrEqual("gene_count", v) => s.max >= lv(v)
      case LessThan("gene_count", v) => s.min < lv(v)
      case LessThanOrEqual("gene_count", v) => s.min <= lv(v)
      case EqualTo("gene_count", v) => s.min <= lv(v) && lv(v) <= s.max
      case _ => true
    }
  }
}
