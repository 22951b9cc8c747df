package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.sources.{Formats, MediaSource}

/** Batch 51: file-granular binary ingest proven end-to-end (the
  * binaryFile DataSource closing the loop on the multimodal family's
  * "media arrives as files" path), and a distributed training step —
  * batch perceptron epochs expressed as aggregations, the primitive
  * every data-parallel trainer reduces to.
  */
object Curation51Queries {

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------- binaryFile source roundtrip
    QueryDef(
      "scan_binary_roundtrip",
      (s, d) => {
        // Fan the media payloads out as one .bin file per record, read
        // the directory back through the binaryFile DataSource, and
        // prove byte fidelity per record (md5 + length vs the oracle's
        // view of the same payload bytes).  The write is an executor-
        // side per-partition fan-out (no driver loop, no payload
        // shuffle); the read-back is the real multimodal ingest path
        // Formats.binaryDir documents.
        // unique per (session, dataset) + shutdown-cleaned: a fixed
        // shared dir would let a concurrent session's clean-first
        // delete THIS session's files mid-read; stale same-key files
        // are still cleaned so the glob never sees another run's ids
        val scratch = new java.io.File(graft.Scratch.register(
          s"${System.getProperty("java.io.tmpdir")}/graft_bin_media_" +
            s"${s.sparkContext.applicationId}_${graft.Scratch.tag(d)}"))
        if (scratch.exists())
          scratch.listFiles().foreach(f => { f.delete(); () })
        scratch.mkdirs()
        val dir = scratch.getAbsolutePath
        MediaSource.media(s, d).toDF()
          .select(col("mediaId"), col("payload"))
          .foreachPartition {
            (it: Iterator[org.apache.spark.sql.Row]) =>
              it.foreach { r =>
                java.nio.file.Files.write(
                  java.nio.file.Paths.get(dir, s"m_${r.getLong(0)}.bin"),
                  r.getAs[Array[Byte]](1))
                ()
              }
          }
        Formats.binaryDir(s, dir, "*.bin")
          .select(
            regexp_extract(col("path"), "m_(\\d+)\\.bin$", 1)
              .cast("bigint").as("media_id"),
            md5(col("content")).as("payload_md5"),
            col("length").as("byte_len"))
      },
      Some("""SELECT doc_id AS media_id, md5(text) AS payload_md5,
        |  octet_length(encode(text))::BIGINT AS byte_len
        |FROM documents""".stripMargin),
      "binaryFile-source round-trip at file granularity: payloads fan " +
        "out one file per record from the executors, then re-enter " +
        "through spark.read.format(\"binaryFile\") with path-glob " +
        "pushdown, and every record's bytes are proven identical " +
        "(md5 + length) to the columnar original.  This is the " +
        "media-arrives-as-files half of the multimodal ingest story " +
        "(media_metadata covers the parquet-column half); at 100 TB " +
        "the scan is governed by maxPartitionBytes and payload bytes " +
        "move scan->digest without ever shuffling."),

    // ------------------------------------- batch perceptron as aggs
    QueryDef(
      "perceptron_quality_epochs",
      (s, d) => {
        // Two batch-perceptron epochs for an is-English linear probe
        // over 4 integer features; each epoch is ONE corpus aggregation
        // (sum of y*x over misclassified rows), the data-parallel
        // gradient primitive.  Weights between epochs live in a 1-row
        // frame joined back by broadcast — no driver collect, no
        // mutable state; all integer, so partitioning-invariant.
        val feats = Tables.documents(s, d).select(
          col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
          lit(1L).as("x0"),
          least(length(col("text")).cast("long"), lit(400L)).as("x1"),
          expr("cast(size(array_distinct(split(text, ' '))) AS bigint) " +
            "* 1000 div cast(size(split(text, ' ')) AS bigint)").as("x2"),
          least(size(split(col("text"), " ")).cast("long"), lit(200L))
            .as("x3"))
        // epoch 1 from w = 0: dot = 0 -> yhat = +1, so exactly the
        // y = -1 rows are misclassified and the update is sum over them
        val w1 = feats.filter(col("y") === -1L)
          .agg(sum(col("y") * col("x0")).as("w0"),
            sum(col("y") * col("x1")).as("w1"),
            sum(col("y") * col("x2")).as("w2"),
            sum(col("y") * col("x3")).as("w3"),
            count(lit(1)).as("err1"))
        // epoch 2: apply w1, update on the new misclassified set
        val scored = feats.crossJoin(broadcast(w1))
          .withColumn("dot",
            col("w0") * col("x0") + col("w1") * col("x1") +
              col("w2") * col("x2") + col("w3") * col("x3"))
          .withColumn("miss",
            when(col("dot") >= 0, lit(1L)).otherwise(lit(-1L)) =!= col("y"))
        scored.agg(
          (first(col("w0")) + sum(when(col("miss"), col("y") * col("x0"))
            .otherwise(0L))).as("w0_final"),
          (first(col("w1")) + sum(when(col("miss"), col("y") * col("x1"))
            .otherwise(0L))).as("w1_final"),
          (first(col("w2")) + sum(when(col("miss"), col("y") * col("x2"))
            .otherwise(0L))).as("w2_final"),
          (first(col("w3")) + sum(when(col("miss"), col("y") * col("x3"))
            .otherwise(0L))).as("w3_final"),
          first(col("err1")).as("err_epoch1"),
          sum(when(col("miss"), 1L).otherwise(0L)).as("err_epoch2"))
      },
      Some("""WITH f AS (SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END::BIGINT AS y,
        |    1::BIGINT AS x0,
        |    least(length(text)::BIGINT, 400) AS x1,
        |    len(list_distinct(string_split(text, ' ')))::BIGINT * 1000
        |      // len(string_split(text, ' '))::BIGINT AS x2,
        |    least(len(string_split(text, ' '))::BIGINT, 200) AS x3
        |  FROM documents),
        |w1 AS (SELECT sum(y * x0)::BIGINT AS w0, sum(y * x1)::BIGINT AS w1,
        |    sum(y * x2)::BIGINT AS w2, sum(y * x3)::BIGINT AS w3,
        |    count(*)::BIGINT AS err1
        |  FROM f WHERE y = -1),
        |sc AS (SELECT f.*, w1.*,
        |    w1.w0 * f.x0 + w1.w1 * f.x1 + w1.w2 * f.x2 + w1.w3 * f.x3
        |      AS dot
        |  FROM f CROSS JOIN w1),
        |m AS (SELECT *, (CASE WHEN dot >= 0 THEN 1 ELSE -1 END) <> y
        |    AS miss FROM sc)
        |SELECT
        |  (any_value(w0) + sum(CASE WHEN miss THEN y * x0 ELSE 0 END))::BIGINT
        |    AS w0_final,
        |  (any_value(w1) + sum(CASE WHEN miss THEN y * x1 ELSE 0 END))::BIGINT
        |    AS w1_final,
        |  (any_value(w2) + sum(CASE WHEN miss THEN y * x2 ELSE 0 END))::BIGINT
        |    AS w2_final,
        |  (any_value(w3) + sum(CASE WHEN miss THEN y * x3 ELSE 0 END))::BIGINT
        |    AS w3_final,
        |  any_value(err1)::BIGINT AS err_epoch1,
        |  sum(CASE WHEN miss THEN 1 ELSE 0 END)::BIGINT AS err_epoch2
        |FROM m""".stripMargin),
      "Batch-perceptron training epochs as corpus aggregations: each " +
        "epoch is one pass computing sum(y*x) over the misclassified " +
        "set — the exact shape of a data-parallel gradient step (map-" +
        "side partials, 4-number reduce), which is why parameter " +
        "servers and allreduce exist.  Inter-epoch state is a 1-row " +
        "weight frame broadcast back, never a driver collect; integer " +
        "features make every epoch bit-deterministic under any " +
        "partitioning.  At 100 TB: epochs = passes, each one scan + " +
        "one O(dims) reduce."),
  )
}
