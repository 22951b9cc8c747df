package graft.sources.v2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources._

/** Sidecar zone map for the genome DSv2 source: per-file min/max/rows
  * of the numeric `gene_count` field, written as `_zonemap.json` next
  * to the shards (the underscore prefix keeps it out of every data
  * listing, matching Spark's own `_`-file convention).  With the
  * sidecar present, [[GenomeScan.planInputPartitions]] skips
  * WHOLE FILES whose value range cannot satisfy the pushed filters —
  * the file-level analog of parquet row-group statistics, and the
  * mechanism behind every "data skipping index" at 100 TB: the scan
  * plans only the shards the predicate can touch, and the row-level
  * pushdown inside the reader stays as the exact second line of
  * defense for the files that are kept.
  *
  * Skipping removes whole files BEFORE the row-level filter ever runs,
  * so a stale entry — a shard rewritten or appended after the sidecar
  * was built — would silently drop matching rows.  To make skipping
  * safe each entry therefore records the shard's (length, mtime) at
  * stats time, and [[FileStats.covers]] refuses to skip any file whose
  * current status no longer matches: stale entries degrade to "plan
  * the file" (correct, merely unoptimized) instead of wrong answers.
  */
object GenomeZoneMap {

  final case class FileStats(min: Long, max: Long, rows: Long,
      len: Long, mtime: Long) {

    /** True only when the entry was computed from the file as it
      * exists NOW: the recorded (length, mtime) still match AND the
      * file's mtime is strictly older than the sidecar itself.  The
      * second condition closes the same-length-rewrite hole the
      * fingerprint alone leaves open — a rewrite landing in the same
      * mtime granule as the original write keeps (len, mtime)
      * identical, but any such rewrite at-or-after the sidecar's own
      * timestamp now degrades to "plan the file".  (The residual
      * window — a rewrite completing between the stats read and the
      * sidecar write, inside the original write's mtime granule — is
      * inherent to mtime fingerprints; stores that rewrite shards
      * in place should regenerate the sidecar, or better, write
      * shards immutably.)  Entries from sidecars that predate the
      * fingerprint fields (len/mtime = -1) never cover, so old
      * sidecars lose skipping but never lose rows. */
    def covers(status: FileStatus, sidecarMtime: Long): Boolean =
      len >= 0 && len == status.getLen &&
        mtime == status.getModificationTime &&
        status.getModificationTime < sidecarMtime
  }

  val SidecarName = "_zonemap.json"

  /** Build the sidecar with a distributed pass: one task per shard
    * computes (min, max, rows) of gene_count; only the per-file stats
    * rows — bounded metadata, not data — come back to the driver.
    * The session's Hadoop configuration is broadcast to the tasks so
    * shard opens see the same credentials / fs.* settings as the
    * driver (a bare `new Configuration()` would drop them on s3a or
    * hdfs).  Each entry is fingerprinted with the shard's current
    * (length, mtime) so readers can detect staleness. */
  def write(spark: SparkSession, dir: String): Unit = {
    val hPath = new Path(dir)
    val fs = FileSystem.get(hPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath).filter(_.isFile)
      .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
      .filterNot { case (f, _, _) => f.contains("/_") || f.contains("/.") }
      .toSeq.sortBy(_._1)
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val stats = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .map { case (f, len, mtime) =>
        val mapper = new ObjectMapper()
        val p = new Path(f)
        val pfs = FileSystem.get(p.toUri, confBc.value.value)
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
        (p.getName, mn, mx, rows, len, mtime)
      }.collect()
    confBc.destroy()
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    stats.foreach { case (name, mn, mx, rows, len, mtime) =>
      val o = root.putObject(name)
      o.put("min", mn); o.put("max", mx); o.put("rows", rows)
      o.put("len", len); o.put("mtime", mtime)
    }
    val out = fs.create(new Path(hPath, SidecarName), true)
    out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    out.close()
  }

  /** Load the sidecar if present (keyed by shard basename), together
    * with the sidecar file's own mtime (the staleness horizon
    * [[FileStats.covers]] checks against).  Entries missing the
    * (len, mtime) fingerprint — sidecars written before it existed —
    * load with -1 markers and are treated as stale by
    * [[FileStats.covers]]. */
  def load(fs: FileSystem, dir: Path)
      : Option[(Map[String, FileStats], Long)] = {
    val p = new Path(dir, SidecarName)
    if (!fs.exists(p)) None
    else {
      val sidecarMtime = fs.getFileStatus(p).getModificationTime
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
        def opt(f: String): Long =
          if (o.has(f)) o.get(f).asLong() else -1L
        b += k -> FileStats(o.get("min").asLong(), o.get("max").asLong(),
          o.get("rows").asLong(), opt("len"), opt("mtime"))
      }
      Some((b.result(), sidecarMtime))
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
