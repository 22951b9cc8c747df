package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The side-effect sinks that can't be oracle-checked (SURVEY S6/S10):
  * partitioned per-record fan-out and idempotent overwrite/ignore. */
class SinkSpec extends SparkSpec {

  test("per-record fan-out: partitionBy(source) writes one dir per corpus") {
    val out = Files.createTempDirectory("graft_sink").toString
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("source=")).map(_.getName).sorted
    assert(dirs.length === 20, dirs.mkString(","))
    val back = spark.read.parquet(out)
    assert(back.count() === Tables.documents(spark, sfDir).count())
    // partition pruning on read: only one dir scanned
    val one = back.filter(col("source") === "src3")
    assert(one.count() === 25)
  }

  test("idempotent rebuild: overwrite replaces, ignore skips (DG:64-65 semantics)") {
    val out = Files.createTempDirectory("graft_sink2").toString + "/t"
    val d5 = Tables.documents(spark, sfDir).limit(5)
      .select(col("doc_id"), col("text"))
    d5.write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).count() === 5)
    // overwrite: delete + rebuild (TM:233-235)
    Tables.documents(spark, sfDir).limit(3)
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).count() === 3)
    // ignore: exists-check before write (DG:64-65) — no-op on existing dir
    d5.write.mode("ignore").parquet(out)
    assert(spark.read.parquet(out).count() === 3)
  }

  test("ORC round-trip: write + read back preserves rows and schema") {
    val out = Files.createTempDirectory("graft_orc").toString + "/t"
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    // columnar format honors pushdown on read like parquet
    assert(back.filter(col("lang") === "en").count() ===
      src.filter(col("lang") === "en").count())
  }

  test("XML round-trip: Spark 4 built-in xml source preserves records") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .filter(col("doc_id") < 50)
    src.write.mode("overwrite").option("rowTag", "doc")
      .format("xml").save(s"$dir/docs")
    val back = spark.read.option("rowTag", "doc")
      .schema(src.schema).format("xml").load(s"$dir/docs")
    assert(back.count() === src.count())
    val a = src.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a === b, "XML round-trip changed record contents")
  }
}
