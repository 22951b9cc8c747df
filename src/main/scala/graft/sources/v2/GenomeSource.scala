package graft.sources.v2

import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's genome JSON-lines input
  * (data_generation/generate_narratives_from_data.py:79-85): a file or
  * directory of line-delimited JSON records becomes a Spark table with
  *
  *  - COLUMN PRUNING pushed into the reader (SupportsPushDownRequiredColumns:
  *    unprojected fields are never materialized from the parsed line),
  *  - FILTER PUSHDOWN evaluated during the scan
  *    (SupportsPushDownFilters: comparison/equality filters on the fixed
  *    schema run before a row is built, and are reported as pushed so
  *    `.explain` shows `PushedFilters` exactly like the parquet source),
  *  - one InputPartition PER FILE, so a directory of shards parallelizes
  *    across executors with no driver-side parsing.
  *
  * Malformed lines and blank/short lines (the reference drops length
  * <= 2, DG:83) are skipped at read time — the dead-letter variant
  * stays in Formats.genomeRecordsTyped which surfaces _corrupt_record.
  *
  * Usage: spark.read.format("graft.sources.v2.GenomeSource").load(path)
  */
class GenomeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenomeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenomeTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object GenomeSource {
  val schema: StructType = StructType(Seq(
    StructField("genome_id", StringType),
    StructField("genome_name", StringType),
    StructField("pathway", StringType),
    StructField("gene_count", LongType)))
}

final class GenomeTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"genome_records($path)"
  override def schema(): StructType = GenomeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenomeScanBuilder(path)
}

final class GenomeScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = GenomeSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the comparison shapes the reader can evaluate pre-row;
    * everything else stays with Spark (returned as residual). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case EqualTo(a, _) => GenomeSource.schema.fieldNames.contains(a)
      case GreaterThan(a, _) => GenomeSource.schema.fieldNames.contains(a)
      case GreaterThanOrEqual(a, _) => GenomeSource.schema.fieldNames.contains(a)
      case LessThan(a, _) => GenomeSource.schema.fieldNames.contains(a)
      case LessThanOrEqual(a, _) => GenomeSource.schema.fieldNames.contains(a)
      case IsNotNull(a) => GenomeSource.schema.fieldNames.contains(a)
      case _ => false
    }
    pushed = ours
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GenomeScan(path, required, pushed)
}

final case class GenomeFilePartition(file: String) extends InputPartition

final class GenomeScan(path: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"GenomeScan PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val hPath = new Path(path)
    val fs = FileSystem.get(hPath.toUri,
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val status = fs.getFileStatus(hPath)
    val files =
      if (status.isDirectory)
        fs.listStatus(hPath).filter(_.isFile)
          .filterNot(st => st.getPath.toString.contains("/_") ||
            st.getPath.toString.contains("/."))
      else Array(status)
    // data skipping: with a _zonemap.json sidecar present, drop whole
    // shards whose gene_count range cannot satisfy the pushed filters.
    // Skipping removes files BEFORE the row-level filter runs, so it is
    // only safe for entries whose recorded (length, mtime) fingerprint
    // still matches the live file (FileStats.covers) — a shard
    // rewritten after the sidecar was built is planned unconditionally
    // and the reader's row-level pushdown keeps it exact.
    val zm =
      if (status.isDirectory) GenomeZoneMap.load(fs, hPath) else None
    val kept = zm match {
      case Some((m, sidecarMtime)) => files.filter { st =>
        m.get(st.getPath.getName) match {
          case Some(s) if s.covers(st, sidecarMtime) =>
            GenomeZoneMap.mightMatch(pushed, s)
          case _ => true // unknown or stale entry: never skip
        }
      }
      case None => files
    }
    kept.map(_.getPath.toString).sorted
      .map(f => GenomeFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenomeReaderFactory(required, pushed, new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GenomeMicroBatchStream(path, required, pushed)
}

/** Streaming read half: the offset is the SORTED SET OF FILES seen so
  * far (files only appear, never mutate — the append-only contract of a
  * landing directory), so each micro-batch plans exactly the files that
  * arrived since the last committed offset.  Offsets serialize to JSON
  * into the checkpoint log, which is what makes restart exactly-once:
  * a re-started query resumes from the last committed file set and
  * never re-reads or skips a shard.  This is the reference's
  * poll-for-new-outputs loop (rag_evaluation/test_all_models.py:45-57)
  * as a first-class streaming source. */
final class GenomeMicroBatchStream(path: String, required: StructType,
    pushed: Array[Filter])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val mapper = new ObjectMapper()

  private def listFiles(): Seq[String] = {
    val hPath = new Path(path)
    val fs = FileSystem.get(hPath.toUri,
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) Seq.empty
    else {
      val st = fs.getFileStatus(hPath)
      if (st.isDirectory)
        fs.listStatus(hPath).filter(_.isFile).map(_.getPath.toString)
          .filterNot(f => f.contains("/_") || f.contains("/."))
          .toSeq.sorted
      else Seq(hPath.toString)
    }
  }

  override def latestOffset(): Offset = GenomeOffset(listFiles())

  override def initialOffset(): Offset = GenomeOffset(Seq.empty)

  override def deserializeOffset(json: String): Offset = {
    val node = mapper.readTree(json)
    val files = (0 until node.size()).map(i => node.get(i).asText())
    GenomeOffset(files)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GenomeOffset].files.toSet
    end.asInstanceOf[GenomeOffset].files
      .filterNot(seen).sorted
      .map(f => GenomeFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenomeReaderFactory(required, pushed, new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class GenomeOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    files.sorted.foreach(arr.add)
    mapper.writeValueAsString(arr)
  }
}

/** Serialized driver -> executor; carries the session Hadoop conf so
  * executor-side file opens keep credentials / fs.* settings. */
final class GenomeReaderFactory(required: StructType, pushed: Array[Filter],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GenomeFileReader(
      partition.asInstanceOf[GenomeFilePartition].file, required, pushed, conf)
}

/** Per-file line reader: parse -> filter -> project, all executor-side. */
final class GenomeFileReader(file: String, required: StructType,
    pushed: Array[Filter], conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val hPath = new Path(file)
  private val fs = FileSystem.get(hPath.toUri, conf.value)
  private val lines = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(hPath), "UTF-8"))
  private var current: InternalRow = _

  private def field(node: JsonNode, name: String): Any = name match {
    case "gene_count" =>
      val n = node.get("gene_count")
      if (n == null || !n.canConvertToLong) null else n.asLong()
    case other =>
      val n = node.get(other)
      if (n == null || n.isNull) null else UTF8String.fromString(n.asText())
  }

  private def passes(node: JsonNode): Boolean = pushed.forall {
    case IsNotNull(a) => field(node, a) != null
    case EqualTo(a, v) => cmp(node, a, v).contains(0)
    case GreaterThan(a, v) => cmp(node, a, v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(node, a, v).exists(_ >= 0)
    case LessThan(a, v) => cmp(node, a, v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(node, a, v).exists(_ <= 0)
    case _ => true
  }

  /** three-valued comparison: None when the field is null (filter fails,
    * matching Spark's null semantics for comparisons) */
  private def cmp(node: JsonNode, name: String, v: Any): Option[Int] =
    field(node, name) match {
      case null => None
      case l: java.lang.Long => Some(java.lang.Long.compare(l,
        v.asInstanceOf[Number].longValue()))
      case s: UTF8String => Some(s.toString.compareTo(v.toString))
    }

  override def next(): Boolean = {
    var line = lines.readLine()
    while (line != null) {
      if (line.trim.length > 2) {
        try {
          val node = mapper.readTree(line)
          if (node != null && node.isObject && passes(node)) {
            current = new GenericInternalRow(
              required.fieldNames.map(f => field(node, f)).toArray[Any])
            return true
          }
        } catch { case _: Exception => () } // malformed line: skip
      }
      line = lines.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
