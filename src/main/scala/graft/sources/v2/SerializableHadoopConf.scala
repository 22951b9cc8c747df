package graft.sources.v2

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper around a Hadoop [[Configuration]] so the
  * SESSION's filesystem settings (credentials, `fs.*` overrides,
  * s3a/hdfs endpoints) travel with DSv2 reader/writer factories and
  * broadcast variables to executor tasks.  Opening executor-side
  * filesystems with a bare `new Configuration()` silently drops all of
  * that — it works on the local fs and breaks on any real cluster
  * store, which is exactly the kind of bug local[32] testing cannot
  * see.  Spark has an identical internal helper
  * (`org.apache.spark.util.SerializableConfiguration`) but it is
  * `private[spark]`, so the source carries its own.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
