package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal snapshot-isolated multi-version table format over parquet —
  * the engine's answer to "how do 100 TB of curated training data get
  * UPDATED without a lake format dependency", built from the same two
  * primitives every production format (Delta, Iceberg, Hudi) reduces
  * to:
  *
  *  1. **Immutable data files + a manifest per version.** A commit
  *     never mutates a data file; it writes new files and a new
  *     manifest (`_versions/v%06d.json`) listing EVERY file in that
  *     snapshot with per-file (rows, min/max of the table key).  A
  *     reader resolves one manifest and reads exactly that file list —
  *     snapshot isolation with no locks, and time travel for free
  *     (read an old manifest).  The per-file key range doubles as a
  *     zone map: `read(..., idRange)` prunes whole files before Spark
  *     ever plans them, the same file-skipping mechanism as
  *     [[graft.sources.v2.GenomeZoneMap]].
  *
  *  2. **Compare-and-swap version allocation.** The manifest for
  *     version N+1 is claimed with `create(path, overwrite = false)` —
  *     atomic on HDFS/local (object stores use a conditional PUT, the
  *     same contract) — so two concurrent committers can never both
  *     win N+1: the loser re-reads the new latest snapshot, REBASES
  *     its carried-over file list on it, and retries at N+2.  Manifest
  *     CONTENT becomes visible atomically (write a temp file, then an
  *     overwrite-rename onto the claimed slot), so readers never parse
  *     a torn manifest.
  *
  * Copy-on-write mutation targets files, not the table: `merge`
  * (upsert: matched keys update, unmatched insert) and `delete` first
  * find the files that actually CONTAIN affected rows (one semi-join /
  * filter pass collecting `_metadata.file_path` — bounded driver state,
  * O(files); the same "find touched files" scan Delta's MERGE runs),
  * rewrite only those, and carry every untouched file into the new
  * manifest by reference.  A merge that touches 1 of 10^6 files
  * rewrites one file.  `vacuum` deletes data files referenced by no
  * kept manifest — space reclamation decoupled from commits, bounded
  * by the manifest union, never able to break a kept snapshot.
  *
  * Driver state is O(files-per-snapshot) manifest entries — the
  * documented ceiling shared by single-manifest Delta logs; the next
  * step at larger file counts is a two-level manifest (file groups),
  * which changes none of the commit protocol here.
  */
object VersionedTable {

  final case class FileEntry(path: String, rows: Long, minId: Long, maxId: Long)
  final case class Snapshot(version: Int, op: String, files: Seq[FileEntry],
      txnId: Option[String] = None) {
    def rows: Long = files.map(_.rows).sum
  }

  private val VersionsDir = "_versions"

  private def fileSystem(s: SparkSession, root: String): FileSystem =
    FileSystem.get(new Path(root).toUri, s.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Int): Path =
    new Path(s"$root/$VersionsDir", f"v$v%06d.json")

  /** Scheme-insensitive path identity (input_file_name says
    * `file:///x`, `_metadata.file_path` says `file:/x`). */
  private def normPath(p: String): String = new Path(p).toUri.getPath

  /** Atomically claim a manifest slot: exactly one concurrent caller
    * may win.  Hadoop's LocalFileSystem `create(overwrite = false)` is
    * check-then-act (two racing threads can both "win" and one
    * manifest silently vanishes — caught by the CAS spec), so local
    * paths claim through NIO's `createFile`, which is O_CREAT|O_EXCL
    * atomic on POSIX.  HDFS `create(overwrite = false)` is atomic at
    * the NameNode and object stores implement this contract with a
    * conditional PUT (If-None-Match), so the FileSystem path is the
    * correct claim everywhere else. */
  private def claimSlot(fs: FileSystem, target: Path): Boolean = {
    val uri = target.toUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(uri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try { fs.create(target, false).close(); true }
      catch { case _: java.io.IOException => false } // lost the race
    }
  }

  /** All committed version numbers, ascending (empty for a fresh root). */
  def versions(s: SparkSession, root: String): Seq[Int] = {
    val fs = fileSystem(s, root)
    val dir = new Path(root, VersionsDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{6}\\.json") =>
        n.substring(1, 7).toInt }
      .sorted
  }

  def latestVersion(s: SparkSession, root: String): Option[Int] =
    versions(s, root).lastOption

  /** Parse one version's manifest.  A version file can exist EMPTY for
    * the moment between a committer's CAS claim and its atomic content
    * rename; readers retry through that window instead of failing (the
    * claim means the content rename is already in flight). */
  def snapshot(s: SparkSession, root: String, v: Int): Snapshot = {
    val fs = fileSystem(s, root)
    var node: com.fasterxml.jackson.databind.JsonNode = null
    var attempts = 0
    while ((node == null || node.get("files") == null) && attempts < 100) {
      if (attempts > 0) Thread.sleep(20)
      attempts += 1
      // FileNotFound is as transient as empty content here: local
      // FileContext.rename(OVERWRITE) implementations can expose a
      // delete-then-rename window where the claimed slot briefly
      // vanishes before the content lands
      try {
        val in = fs.open(manifestPath(root, v))
        node = try new ObjectMapper().readTree(in) finally in.close()
      } catch { case _: java.io.FileNotFoundException => () }
    }
    if (node == null || node.get("files") == null)
      throw new IllegalStateException(
        s"manifest v$v under $root unreadable after $attempts attempts")
    val filesNode = node.get("files")
    val entries = (0 until filesNode.size()).map { i =>
      val f = filesNode.get(i)
      FileEntry(f.get("path").asText(), f.get("rows").asLong(),
        f.get("minId").asLong(), f.get("maxId").asLong())
    }
    Snapshot(node.get("version").asInt(), node.get("op").asText(), entries,
      Option(node.get("txn")).map(_.asText()))
  }

  /** Has a commit carrying this transaction id already landed?  The
    * scan is O(versions) manifest reads — the idempotence ledger every
    * exactly-once sink needs (Delta's `txnAppId/txnVersion`, Iceberg's
    * snapshot summary props play the same role). */
  def txnCommitted(s: SparkSession, root: String, txnId: String): Boolean =
    versions(s, root).exists(v =>
      snapshot(s, root, v).txnId.contains(txnId))

  /** Read a snapshot (latest when version is None).  `idRange` prunes
    * whole files through the manifest's per-file key range BEFORE Spark
    * plans the scan — the row-level filter must still be applied by the
    * caller; pruning only discards files that cannot contain the range. */
  def read(s: SparkSession, root: String, version: Option[Int] = None,
      idRange: Option[(Long, Long)] = None): DataFrame = {
    val v = version.orElse(latestVersion(s, root)).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    val snap = snapshot(s, root, v)
    val kept = idRange match {
      case None => snap.files
      case Some((lo, hi)) =>
        snap.files.filter(f => f.maxId >= lo && f.minId <= hi)
    }
    if (kept.isEmpty)
      s.read.parquet(snap.files.head.path).limit(0)
    else
      // mergeSchema: a snapshot can mix files written before and after
      // a column was added (schema evolution) — older files surface
      // the new column as null, and a time-travel read of an all-old
      // snapshot simply lacks the column
      s.read.option("mergeSchema", "true").parquet(kept.map(_.path): _*)
  }

  /** The manifest-pruned file list for a key range (exposed so specs
    * and plans can assert how many files a pruned read touches). */
  def prunedFiles(s: SparkSession, root: String, v: Int,
      lo: Long, hi: Long): Seq[FileEntry] =
    snapshot(s, root, v).files.filter(f => f.maxId >= lo && f.minId <= hi)

  /** Write `df` as `numFiles` parquet files under a fresh commit dir and
    * return their manifest entries (rows + key min/max per file, read
    * back from the just-written files only). */
  private def writeFiles(s: SparkSession, root: String, df: DataFrame,
      idCol: String, numFiles: Int): Seq[FileEntry] = {
    val dir = s"$root/data/${java.util.UUID.randomUUID().toString}"
    df.repartitionByRange(numFiles, col(idCol)).write.parquet(dir)
    s.read.parquet(dir)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"),
        min(col(idCol)).as("minId"), max(col(idCol)).as("maxId"))
      .collect()
      .map(r => FileEntry(r.getAs[String]("path"), r.getAs[Long]("rows"),
        r.getAs[Long]("minId"), r.getAs[Long]("maxId")))
      .toSeq.sortBy(_.path)
  }

  /** Commit `newFiles ++ carryOver(parent)` as the next version via the
    * CAS protocol.  `carryOver` is re-evaluated against the CURRENT
    * latest snapshot on every attempt, so a committer that loses the
    * race rebases (e.g. an append carries the winner's files too).
    * Returns the committed version number. */
  private def commitManifest(s: SparkSession, root: String, op: String,
      newFiles: Seq[FileEntry],
      carryOver: Option[Snapshot] => Seq[FileEntry],
      txnId: Option[String] = None,
      requireParent: Option[Int] = None): Int = {
    val fs = fileSystem(s, root)
    fs.mkdirs(new Path(root, VersionsDir))
    val mapper = new ObjectMapper()
    var committed = -1
    var attempts = 0
    while (committed < 0) {
      attempts += 1
      if (attempts > 100)
        throw new IllegalStateException(
          s"commit to $root lost the version race $attempts times " +
            "(or the claim create keeps failing for a non-race reason)")
      // exactly-once: if this transaction already committed (a retried
      // micro-batch, a racing duplicate of ourselves), return its
      // version instead of applying twice; our orphaned data files are
      // vacuum's problem, by design
      txnId.foreach { t =>
        versions(s, root).find(v => snapshot(s, root, v).txnId.contains(t))
          .foreach(v => return v)
      }
      val parent = latestVersion(s, root).map(snapshot(s, root, _))
      // a carry list computed against a specific parent snapshot is
      // only valid on TOP of that snapshot: if someone else committed
      // first, the files we'd carry may no longer exist in the head
      // (e.g. the winner rewrote them), so surface the conflict and
      // let the caller re-derive its file sets against the new head
      requireParent.foreach { expected =>
        if (!parent.map(_.version).contains(expected))
          throw new java.util.ConcurrentModificationException(
            s"table $root moved past v$expected " +
              s"(head is v${parent.map(_.version).getOrElse(0)})")
      }
      val v = parent.map(_.version + 1).getOrElse(1)
      val files = (carryOver(parent) ++ newFiles).sortBy(_.path)
      val node = mapper.createObjectNode()
      node.put("version", v); node.put("op", op)
      txnId.foreach(node.put("txn", _))
      val arr = node.putArray("files")
      files.foreach { f =>
        val o = arr.addObject()
        o.put("path", f.path); o.put("rows", f.rows)
        o.put("minId", f.minId); o.put("maxId", f.maxId)
      }
      val target = manifestPath(root, v)
      val claimed = claimSlot(fs, target)
      if (claimed) {
        // content becomes visible atomically: full write to a temp
        // file, then overwrite-rename onto the claimed slot
        val tmp = new Path(s"$root/$VersionsDir",
          s".tmp-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
        out.close()
        FileContext.getFileContext(new Path(root).toUri,
          s.sparkContext.hadoopConfiguration)
          .rename(tmp, target, Options.Rename.OVERWRITE)
        committed = v
      }
      // not claimed: loop — latestVersion now sees the winner, carryOver
      // rebases on it
    }
    committed
  }

  /** Append: new files join the parent snapshot's files untouched.
    * Concurrency-safe without conflict detection — the carry list is
    * re-derived from the CURRENT head on every CAS attempt.  `txnId`
    * makes the commit idempotent (a retry of the same transaction
    * returns the already-committed version instead of appending twice). */
  def append(s: SparkSession, root: String, df: DataFrame,
      idCol: String, numFiles: Int, op: String = "append",
      txnId: Option[String] = None): Int = {
    txnId.foreach(t =>
      versions(s, root).find(v => snapshot(s, root, v).txnId.contains(t))
        .foreach(v => return v))
    val newFiles = writeFiles(s, root, df, idCol, numFiles)
    commitManifest(s, root, op, newFiles,
      parent => parent.map(_.files).getOrElse(Seq.empty), txnId)
  }

  /** Re-run `op` (which derives file sets against the head snapshot)
    * until its commit lands on the parent it was derived from — the
    * optimistic-concurrency loop every lake format runs for mutations
    * whose carry list is only valid on top of a specific snapshot. */
  private def retryingConflicts(root: String)(op: () => Int): Int = {
    var out = -1
    var attempts = 0
    while (out < 0) {
      attempts += 1
      if (attempts > 20) throw new IllegalStateException(
        s"mutation of $root kept conflicting after $attempts attempts")
      try out = op()
      catch { case _: java.util.ConcurrentModificationException => () }
    }
    out
  }

  /** MERGE INTO (upsert): rows of `updates` whose key matches a current
    * row replace it; unmatched keys insert.  Copy-on-write at file
    * granularity: one semi-join pass finds the files that CONTAIN a
    * matched key (`_metadata.file_path` collect — O(files) driver
    * state), only those are rewritten (their unmatched rows ++ all of
    * `updates`), and every untouched file carries over by reference.
    * If another commit lands first, the whole derivation re-runs
    * against the new head (optimistic concurrency); with `txnId` the
    * merge is exactly-once under retries. */
  def merge(s: SparkSession, root: String, updates: DataFrame,
      idCol: String, numFiles: Int,
      txnId: Option[String] = None): Int = retryingConflicts(root) { () =>
    txnId.foreach(t =>
      versions(s, root).find(v => snapshot(s, root, v).txnId.contains(t))
        .foreach(v => return v))
    val parentV = latestVersion(s, root).getOrElse(
      throw new IllegalStateException("merge into empty table"))
    val snap = snapshot(s, root, parentV)
    val current = s.read.parquet(snap.files.map(_.path): _*)
    val keys = updates.select(col(idCol)).distinct()
    // _metadata.file_path (not input_file_name) — it binds to the scan
    // relation, so it survives the join with the update keys
    val touched = current
      .select(col(idCol), col("_metadata.file_path").as("f"))
      .join(broadcast(keys), Seq(idCol), "left_semi")
      .select(col("f")).distinct()
      .collect().map(r => normPath(r.getString(0))).toSet
    val (rewrite, carry) =
      snap.files.partition(f => touched.contains(normPath(f.path)))
    val survivors =
      if (rewrite.isEmpty) updates
      else s.read.option("mergeSchema", "true")
        .parquet(rewrite.map(_.path): _*)
        .join(broadcast(keys), Seq(idCol), "left_anti")
        // allowMissingColumns: an upsert batch may ADD columns (schema
        // evolution) — surviving old rows carry null for them
        .unionByName(updates, allowMissingColumns = true)
    val newFiles = writeFiles(s, root, survivors, idCol, numFiles)
    commitManifest(s, root, "merge", newFiles, _ => carry, txnId,
      requireParent = Some(parentV))
  }

  /** DELETE WHERE: files containing no matching row carry over by
    * reference; the rest are rewritten without the matching rows.
    * Same optimistic-concurrency + txn idempotence contract as
    * [[merge]]. */
  def delete(s: SparkSession, root: String, cond: Column,
      idCol: String, numFiles: Int,
      txnId: Option[String] = None): Int = retryingConflicts(root) { () =>
    txnId.foreach(t =>
      versions(s, root).find(v => snapshot(s, root, v).txnId.contains(t))
        .foreach(v => return v))
    val parentV = latestVersion(s, root).getOrElse(
      throw new IllegalStateException("delete from empty table"))
    val snap = snapshot(s, root, parentV)
    val current = s.read.parquet(snap.files.map(_.path): _*)
    val touched = current.filter(cond)
      .select(col("_metadata.file_path").as("f")).distinct()
      .collect().map(r => normPath(r.getString(0))).toSet
    val (rewrite, carry) =
      snap.files.partition(f => touched.contains(normPath(f.path)))
    if (rewrite.isEmpty)
      commitManifest(s, root, "delete", Seq.empty, _ => carry, txnId,
        requireParent = Some(parentV))
    else {
      val survivors = s.read.option("mergeSchema", "true")
        .parquet(rewrite.map(_.path): _*).filter(!cond)
      val newFiles = writeFiles(s, root, survivors, idCol, numFiles)
      commitManifest(s, root, "delete", newFiles, _ => carry, txnId,
        requireParent = Some(parentV))
    }
  }

  /** OPTIMIZE (small-file compaction): every current file whose row
    * count is below `minRows` is coalesced into `numFiles` fresh
    * range-partitioned files; files already big enough carry over by
    * reference.  Row-preserving by construction (pure rewrite, no
    * predicate), so the new version reads identically — this is the
    * maintenance op a streaming upsert table needs, because each
    * micro-batch commit lands one small file set and scan efficiency
    * decays with file count.  Same optimistic-concurrency contract as
    * [[merge]].  Returns the committed version. */
  def optimize(s: SparkSession, root: String, minRows: Long,
      idCol: String, numFiles: Int): Int = retryingConflicts(root) { () =>
    val parentV = latestVersion(s, root).getOrElse(
      throw new IllegalStateException("optimize of empty table"))
    val snap = snapshot(s, root, parentV)
    val (small, carry) = snap.files.partition(_.rows < minRows)
    if (small.size <= 1)
      commitManifest(s, root, "optimize", Seq.empty, _ => snap.files,
        requireParent = Some(parentV))
    else {
      val packed = s.read.parquet(small.map(_.path): _*)
      val newFiles = writeFiles(s, root, packed, idCol, numFiles)
      commitManifest(s, root, "optimize", newFiles, _ => carry,
        requireParent = Some(parentV))
    }
  }

  /** Snapshot diff as (added, removed) row multisets, manifest-aware:
    * files shared by both manifests are carried by REFERENCE, so their
    * rows cancel exactly and never need scanning — with snapshots
    * v_a = S + A and v_b = S + B (S the shared files), v_b minus v_a =
    * B minus A as multisets.  Only the differing files are read: a
    * 10^6-file table whose commit rewrote 3 files diffs by scanning 6,
    * which is what makes incremental downstream refresh (re-embed only
    * changed docs) affordable at 100 TB. */
  def diff(s: SparkSession, root: String, vFrom: Int, vTo: Int)
      : (DataFrame, DataFrame) = {
    val from = snapshot(s, root, vFrom)
    val to = snapshot(s, root, vTo)
    val fromPaths = from.files.map(_.path).toSet
    val toPaths = to.files.map(_.path).toSet
    def readOr(paths: Seq[String], template: String): DataFrame =
      if (paths.isEmpty) s.read.parquet(template).limit(0)
      else s.read.parquet(paths: _*)
    val template = (from.files ++ to.files).head.path
    val onlyFrom = readOr(from.files.map(_.path).filterNot(toPaths), template)
    val onlyTo = readOr(to.files.map(_.path).filterNot(fromPaths), template)
    (onlyTo.exceptAll(onlyFrom), onlyFrom.exceptAll(onlyTo))
  }

  /** Remove data files referenced by NO manifest with version >=
    * keepFrom, and the manifests below keepFrom.  Returns
    * (dataFilesBefore, dataFilesDeleted). */
  def vacuum(s: SparkSession, root: String, keepFrom: Int): (Int, Int) = {
    val fs = fileSystem(s, root)
    val referenced = versions(s, root).filter(_ >= keepFrom)
      .flatMap(v => snapshot(s, root, v).files.map(_.path))
      .map(p => new Path(p).toUri.getPath).toSet
    val dataDir = new Path(root, "data")
    val all = scala.collection.mutable.ArrayBuffer.empty[Path]
    val it = fs.listFiles(dataDir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
        all += st.getPath
    }
    val doomed = all.filterNot(p => referenced.contains(p.toUri.getPath))
    doomed.foreach(p => fs.delete(p, false))
    versions(s, root).filter(_ < keepFrom)
      .foreach(v => fs.delete(manifestPath(root, v), false))
    (all.size, doomed.size)
  }
}
