package graft.sources.v2

import java.util

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Write half of the V2 genome connector: JSON-lines out, with the full
  * commit protocol — each task writes to a staged `_tmp-<task>` file and
  * the DRIVER renames staged files into place only on job commit
  * (abort deletes them), so a failed or speculative task never leaves a
  * partial shard visible.  That staging+rename dance is the same
  * exactly-once contract the built-in FileBatchWrite implements, made
  * explicit here; at 100 TB an object-store variant commits via
  * manifest instead of rename (rename is not atomic on S3), which is
  * exactly what this interface isolates behind `commit()`.
  *
  * Usage: df.write.format("graft.sources.v2.GenomeSink")
  *          .mode("append").option("path", dir).save()
  */
class GenomeSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenomeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenomeSinkTable(properties.get("path"), schema)
  override def supportsExternalMetadata(): Boolean = true
}

final class GenomeSinkTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"genome_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GenomeBatchWrite(path, info.schema())
      }
    }
}

final case class GenomeCommitMessage(staged: String, finalName: String)
    extends WriterCommitMessage

final class GenomeBatchWrite(path: String, schema: StructType)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GenomeWriterFactory(path, schema, new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))

  /** Driver-side: publish staged files atomically-per-file. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new Path(path).toUri,
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    messages.foreach { case GenomeCommitMessage(staged, finalName) =>
      val from = new Path(staged)
      if (fs.exists(from)) fs.rename(from, new Path(path, finalName))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new Path(path).toUri,
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    messages.foreach {
      case GenomeCommitMessage(staged, _) =>
        val p = new Path(staged)
        if (fs.exists(p)) fs.delete(p, false)
      case _ => ()
    }
  }
}

/** Serialized driver -> executor; carries the session Hadoop conf so
  * task-side staged-file creation keeps credentials / fs.* settings. */
final class GenomeWriterFactory(path: String, schema: StructType,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GenomeJsonWriter(path, schema, partitionId, taskId, conf)
}

final class GenomeJsonWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long, conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {

  private val staged = s"$dir/_tmp-part-$partitionId-$taskId.jsonl"
  private val finalName = f"part-$partitionId%05d.jsonl"
  private val fs = FileSystem.get(new Path(dir).toUri, conf.value)
  private val out = {
    fs.mkdirs(new Path(dir))
    new java.io.PrintWriter(new java.io.OutputStreamWriter(
      fs.create(new Path(staged), true), "UTF-8"))
  }
  private val nodes = JsonNodeFactory.instance
  private val mapper = new ObjectMapper()

  override def write(row: InternalRow): Unit = {
    val obj = nodes.objectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case LongType => obj.put(f.name, row.getLong(i))
        case IntegerType => obj.put(f.name, row.getInt(i))
        case DoubleType => obj.put(f.name, row.getDouble(i))
        case _ => obj.put(f.name, row.getUTF8String(i).toString)
      }
    }
    out.println(mapper.writeValueAsString(obj))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GenomeCommitMessage(staged, finalName)
  }

  override def abort(): Unit = {
    out.close()
    val p = new Path(staged)
    if (fs.exists(p)) fs.delete(p, false)
  }

  override def close(): Unit = ()
}
