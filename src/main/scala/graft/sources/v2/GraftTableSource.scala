package graft.sources.v2

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.VersionedTable

/** `spark.read.format("graft-table")` — the versioned table as a
  * native Spark relation, built the way Delta builds its reads: a
  * [[HadoopFsRelation]] over Spark's own VECTORIZED parquet format
  * with a custom [[FileIndex]] that lists exactly one snapshot's
  * files and prunes them with the MANIFEST's metadata before Spark
  * plans a single task.  Nothing is re-implemented on the read path —
  * whole-stage codegen, vectorized decoding, parquet row-group
  * pushdown and column pruning are all the stock scan; what the
  * connector adds is the lakehouse layer: which files exist (snapshot
  * isolation), and which of those can be SKIPPED for this query's
  * filters (zone maps, column stats, string stats, blooms).
  *
  * Options: `versionAsOf` / `timestampAsOf` (same contract as
  * [[VersionedTable.readOptions]]).  Filter-driven skipping is
  * automatic: Catalyst hands `listFiles` the query's data filters,
  * and the index maps
  *   - key-column comparisons -> per-file minId/maxId zone maps
  *     (the key column name rides the `table.key` property),
  *   - long/timestamp comparisons -> per-file column stats,
  *   - string comparisons -> truncated string stats,
  *   - equality on bloom-enrolled columns -> bloom probes,
  * all conservatively (a file without the stat is kept; every
  * comparison shape the index cannot prove stays with Spark's
  * row-level filters, which always still run — skipping is never
  * allowed to change an answer, only the file count).
  *
  * DELETION-VECTOR snapshots are rejected loudly: a raw parquet scan
  * cannot mask DV'd rows (Delta needed a custom FileFormat for
  * exactly this), so the connector demands `purgeDeletes` first or
  * the library read path.  Schema comes from the manifest's
  * `table.schema` property in O(1) (maintained by every row-adding
  * commit, widened on evolution so older files surface added columns
  * as null); pre-property history falls back to a mergeSchema footer
  * sweep. */
class GraftTableSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-table"

  /** STREAMING sink half: `df.writeStream.format("graft-table")` —
    * every micro-batch upserts as one table version, exactly-once
    * through the table's transaction ledger (txn id derived from the
    * CHECKPOINT location + batch id, so a restart from the same
    * checkpoint re-committing a batch is a no-op, while a different
    * query writing the same table keeps its own id space).  The first
    * batch on a fresh root loads the table; `orderCol` opts into
    * keep-last resolution of multi-event-per-key batches, exactly
    * [[graft.streaming.VersionedSink.upsertStream]]'s contract behind
    * the standard writeStream surface. */
  override def createSink(ctx: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table needs a path"))
    val keyCol = parameters.getOrElse("keyCol",
      throw new IllegalArgumentException(
        "graft-table streaming sink needs option keyCol"))
    val numFiles = parameters.get("numFiles").map(_.toInt).getOrElse(8)
    val ns = parameters.getOrElse("checkpointLocation", root)
    new GraftStreamSink(root, keyCol, numFiles, ns,
      parameters.get("orderCol"),
      parameters.get("autoCompactEvery").map(_.toInt),
      parameters.get("autoCompactMinRows").map(_.toLong))
  }

  /** WRITE half: `df.write.format("graft-table").mode(...).save(root)`.
    * Append = [[VersionedTable.append]] (constraints enforced, stats/
    * blooms recorded, table.key self-described); Overwrite = a new
    * version whose file list REPLACES the head — the previous history
    * stays time-travelable, exactly Delta's overwrite; ErrorIfExists /
    * Ignore follow their SaveMode contracts against the table's
    * existence.  Options: `keyCol` (required for the FIRST write of a
    * table; later writes default to the recorded `table.key`) and
    * `numFiles` (default 8). */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val s = ctx.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table needs a path"))
    val exists = VersionedTable.latestVersion(s, root).isDefined
    val keyCol = parameters.get("keyCol")
      .orElse(if (exists)
        VersionedTable.snapshot(s, root,
          VersionedTable.latestVersion(s, root).get)
          .props.get(VersionedTable.TableKeyProp)
      else None)
      .getOrElse(throw new IllegalArgumentException(
        "graft-table write needs option keyCol (none recorded yet)"))
    val numFiles = parameters.get("numFiles").map(_.toInt).getOrElse(8)
    mode match {
      case SaveMode.Append =>
        VersionedTable.append(s, root, data, keyCol, numFiles)
      case SaveMode.Overwrite =>
        VersionedTable.overwrite(s, root, data, keyCol, numFiles)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft-table at $root already exists (SaveMode.ErrorIfExists)")
      case SaveMode.ErrorIfExists =>
        VersionedTable.append(s, root, data, keyCol, numFiles)
      case SaveMode.Ignore =>
        if (!exists) VersionedTable.append(s, root, data, keyCol, numFiles)
        else VersionedTable.latestVersion(s, root).get
    }
    createRelation(ctx, Map("path" -> root))
  }

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val s = ctx.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table needs a path"))
    val v = parameters.get("versionAsOf").map(_.toInt)
      .orElse(parameters.get("timestampAsOf").map(t =>
        resolveTs(s, root, t)))
      .orElse(VersionedTable.latestVersion(s, root))
      .getOrElse(throw new IllegalStateException(
        s"no committed version under $root"))
    val snap = VersionedTable.snapshot(s, root, v)
    require(snap.files.forall(_.dv.isEmpty),
      s"graft-table cannot serve v$v of $root: snapshot carries " +
        "deletion vectors a raw parquet scan cannot mask — run " +
        "purgeDeletes first or read via VersionedTable.read")
    // schema: O(1) from the manifest's table.schema property (written
    // by every row-adding commit, widened on evolution); pre-property
    // history falls back to a full mergeSchema footer sweep — correct,
    // just not O(1)
    val schema = snap.props.get(VersionedTable.TableSchemaProp)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
      .getOrElse {
        if (snap.files.isEmpty) new StructType()
        else s.read.option("mergeSchema", "true")
          .parquet(snap.files.map(_.path): _*).schema
      }
    val index = new GraftFileIndex(s, root, snap)
    HadoopFsRelation(index, new StructType(), schema, None,
      new ParquetFileFormat(),
      Map("mergeSchema" -> "true"))(s)
  }

  private def resolveTs(s: SparkSession, root: String, t: String): Int = {
    val millis = scala.util.Try(t.toLong).getOrElse(
      java.time.Instant.parse(t).toEpochMilli)
    VersionedTable.versions(s, root)
      .filter(v => VersionedTable.snapshot(s, root, v).tsMillis <= millis)
      .lastOption.getOrElse(throw new IllegalArgumentException(
        s"timestampAsOf $t precedes the first kept commit of $root"))
  }
}

/** The per-batch commit half of the streaming sink: upsert the
  * micro-batch with a checkpoint-derived txn id, so Structured
  * Streaming's at-least-once replay meets the table's exactly-once
  * ledger — the same construction as
  * [[graft.streaming.VersionedSink.upsertStream]]. */
final class GraftStreamSink(root: String, keyCol: String,
    numFiles: Int, txnNamespace: String, orderCol: Option[String],
    autoCompactEvery: Option[Int] = None,
    autoCompactMinRows: Option[Long] = None)
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    val s = data.sparkSession
    // `data` carries the micro-batch behind a STREAMING logical plan;
    // planning new queries over it (the merge's joins) would trip the
    // batch-query checker, so rebase the ALREADY-PLANNED execution
    // onto a batch LogicalRDD first — the same conversion
    // ForeachBatchSink applies before handing users their DataFrame
    val batch = org.apache.spark.sql.GraftShims
      .streamingBatchToBatchDF(data)
    val txn = Some(s"graft-table#$txnNamespace#$batchId")
    if (!batch.isEmpty) {
      if (VersionedTable.latestVersion(s, root).isEmpty)
        VersionedTable.append(s, root,
          VersionedTable.dedupeKeepLast(batch, keyCol, orderCol),
          keyCol, numFiles, op = "load", txnId = txn)
      else
        VersionedTable.merge(s, root, batch, keyCol, numFiles,
          txnId = txn, orderCol = orderCol)
      // AUTO-COMPACTION (Delta's autoCompact, opt-in): a steady
      // micro-batch trickle writes small files forever; every Nth
      // batch bin-packs files under the threshold back to the target
      // count.  Runs AFTER the batch's commit (never blocks its txn),
      // is itself a normal commit under the optimistic-concurrency
      // loop, and is idempotent by construction — optimize on an
      // already-compact table is a no-op that commits nothing.
      autoCompactEvery.foreach { n =>
        if (n > 0 && batchId % n == (n - 1))
          VersionedTable.optimize(s, root,
            autoCompactMinRows.getOrElse(1000L), keyCol, numFiles)
      }
      ()
    }
  }
  override def toString: String = s"GraftStreamSink($root)"
}

/** One snapshot's manifest as a [[FileIndex]]: `listFiles` receives
  * the query's data filters as Catalyst expressions and returns the
  * file subset the manifest cannot rule out. */
final class GraftFileIndex(s: SparkSession, root: String,
    snap: VersionedTable.Snapshot) extends FileIndex {

  private val keyCol: Option[String] = snap.props.get(
    VersionedTable.TableKeyProp)

  // file lengths come from the MANIFEST (recorded at write time), so
  // relation build costs ZERO per-file filesystem RPCs; pre-feature
  // entries (bytes = 0) fall back to one memoized status probe each
  private lazy val statuses: Map[String, FileStatus] = {
    lazy val fs = FileSystem.get(new Path(root).toUri,
      s.sparkContext.hadoopConfiguration)
    snap.files.map { f =>
      f.path -> (if (f.bytes > 0L)
        new FileStatus(f.bytes, false, 1, 128L * 1024 * 1024, 0L,
          new Path(f.path))
      else fs.getFileStatus(new Path(f.path)))
    }.toMap
  }

  override def rootPaths: Seq[Path] = Seq(new Path(root))
  override def partitionSchema: StructType = new StructType()
  override def refresh(): Unit = ()
  override def inputFiles: Array[String] = snap.files.map(_.path).toArray
  override def sizeInBytes: Long = statuses.values.map(_.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = VersionedTable.pruneWithBounds(snap, keyCol,
      GraftPruning.bounds(dataFilters))
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(f => statuses(f.path)).toArray))
  }
}

/** Catalyst-expression -> manifest-pruning translation, shared by the
  * connector and tests.  Lives here (not in VersionedTable) to keep
  * the core format free of execution-package imports. */
object GraftPruning {
  /** Extract (column, op, literal) conjuncts the manifest can act on. */
  def bounds(dataFilters: Seq[Expression])
      : Seq[(String, String, Any)] = dataFilters.flatMap {
    case EqualTo(a: Attribute, Literal(v, _)) => Seq((a.name, "=", v))
    case EqualTo(Literal(v, _), a: Attribute) => Seq((a.name, "=", v))
    case GreaterThan(a: Attribute, Literal(v, _)) => Seq((a.name, ">", v))
    case GreaterThan(Literal(v, _), a: Attribute) => Seq((a.name, "<", v))
    case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
      Seq((a.name, ">=", v))
    case GreaterThanOrEqual(Literal(v, _), a: Attribute) =>
      Seq((a.name, "<=", v))
    case LessThan(a: Attribute, Literal(v, _)) => Seq((a.name, "<", v))
    case LessThan(Literal(v, _), a: Attribute) => Seq((a.name, ">", v))
    case LessThanOrEqual(a: Attribute, Literal(v, _)) =>
      Seq((a.name, "<=", v))
    case LessThanOrEqual(Literal(v, _), a: Attribute) =>
      Seq((a.name, ">=", v))
    case _ => Seq.empty // unsupported shape: Spark's row filter handles it
  }
}
