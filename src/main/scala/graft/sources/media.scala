package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column support: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * The decode step is STUBBED (no image/audio libs in this container):
  * [[MediaCodec.decodeStub]] derives deterministic fake features from the
  * bytes.  Everything Spark-side — schema, Dataset encoders, partitioning,
  * batch shape of the mapPartitions pass — is real and tested.  Swapping
  * in a real decoder is a one-function change that keeps the plan intact.
  *
  * At 100 TB: payload bytes stay in the value column, are never shuffled
  * (all derivations are narrow maps), and feature extraction runs
  * per-partition with bounded batches — the same shape a Pandas-UDF /
  * Arrow pipeline would have.
  */
final case class MediaMeta(
    kind: String,        // image | audio | video
    width: Int,
    height: Int,
    durationMs: Long,
    fmt: String)

final case class MediaRecord(
    mediaId: Long,
    payload: Array[Byte],
    meta: MediaMeta)

final case class MediaFeatures(
    mediaId: Long,
    kind: String,
    byteLen: Long,
    f0: Long, f1: Long, f2: Long, f3: Long)

object MediaCodec {
  /** Deterministic stand-in for image/audio decode: 4 features from the
    * decoded content.  A real implementation would decode + resize /
    * resample here; the call shape (Iterator[MediaRecord] =>
    * Iterator[...], batch per partition) is what matters to the engine.
    *
    * The stub "decodes" the UTF-8 payload back to text and derives
    * features from Unicode CODEPOINTS (not raw bytes) — the same unit the
    * DuckDB oracle's unicode(c) uses — so parity holds for non-ASCII
    * payloads too.  byteLen stays the raw payload size. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val cps = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().toArray
    def at(i: Int): Long = if (cps.isEmpty) 0L else cps(i % cps.length).toLong
    MediaFeatures(r.mediaId, r.meta.kind, r.payload.length.toLong,
      at(0), at(1), at(2),
      cps.foldLeft(0L)((acc, c) => (acc + c) % 100000L))
  }
}

object MediaSource {
  private val kinds = Seq("image", "audio", "video")

  /** Synthesize a media table from `documents`: payload = UTF-8 text
    * bytes, kind/meta derived deterministically from doc fields. */
  def media(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("mediaId"),
        col("text").cast("binary").as("payload"),
        struct(
          element_at(array(kinds.map(lit): _*),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
          (pmod(col("n_chars"), lit(640)) + 16).cast("int").as("width"),
          (pmod(col("n_chars"), lit(480)) + 16).cast("int").as("height"),
          (col("n_chars") * 40).as("durationMs"),
          upper(col("lang")).as("fmt")).as("meta"))
      .as[MediaRecord]
  }

  /** The mapPartitions feature-extraction pass (real plumbing, stub
    * decode).  One decoder instance per partition, records streamed. */
  def extractFeatures(m: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import m.sparkSession.implicits._
    m.mapPartitions(_.map(MediaCodec.decodeStub))
  }

  /** Frame sampling for video rows: one row per sampled frame at 1 fps. */
  def sampleFrames(s: SparkSession, d: String): DataFrame = {
    val m = media(s, d).toDF()
    m.filter(col("meta.kind") === "video")
      .select(col("mediaId"),
        explode(sequence(lit(0L), expr("meta.durationMs div 1000")))
          .as("frame_idx"))
      .select(col("mediaId").as("media_id"),
        col("frame_idx").cast("bigint").as("frame_idx"))
  }
}
