package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.MediaSource

/** Multimodal-column queries over the synthesized media table (see
  * graft.sources.media): metadata projection, the mapPartitions
  * feature-extraction pass (stub decode, real plumbing), and video frame
  * sampling.  Oracles replicate the deterministic stub arithmetic. */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "media_metadata",
      (s, d) => MediaSource.media(s, d).toDF().select(
        col("mediaId").as("media_id"),
        col("meta.kind").as("kind"),
        col("meta.width").cast("bigint").as("width"),
        col("meta.height").cast("bigint").as("height"),
        col("meta.durationMs").as("duration_ms"),
        col("meta.fmt").as("fmt"),
        length(col("payload")).cast("bigint").as("byte_len")),
      Some("""SELECT doc_id AS media_id,
        | ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
        | (n_chars % 640 + 16) AS width,
        | (n_chars % 480 + 16) AS height,
        | (n_chars * 40) AS duration_ms,
        | upper(lang) AS fmt,
        | octet_length(encode(text))::BIGINT AS byte_len
        |FROM documents""".stripMargin),
      "Binary payload + typed metadata projection: media as first-class " +
        "columns; the payload is opaque bytes, never parsed by the plan."),

    QueryDef(
      "media_dedup_bytes",
      (s, d) => {
        val m = MediaSource.media(s, d).toDF()
          .select(col("mediaId").as("media_id"),
            md5(col("payload")).as("payload_md5"),
            length(col("payload")).cast("bigint").as("byte_len"))
        m.groupBy(col("payload_md5"), col("byte_len"))
          .agg(count(lit(1)).as("n_copies"),
            min(col("media_id")).as("keeper_id"))
          .filter(col("n_copies") >= 1)
      },
      Some("""SELECT md5(text) AS payload_md5,
        |  octet_length(encode(text))::BIGINT AS byte_len,
        |  count(*)::BIGINT AS n_copies,
        |  min(doc_id) AS keeper_id
        |FROM documents
        |GROUP BY 1, 2""".stripMargin),
      "Byte-level exact dedup over BINARY media payloads: md5 of the " +
        "raw bytes (not any decoded form) + length as the group key, " +
        "min-id keeper per content group — the first pass of any " +
        "multimodal ingest, running BEFORE decode so duplicate images/" +
        "audio never cost decoder time. The hash is computed in the " +
        "scan projection, so only (16-byte digest, length) ever " +
        "shuffles — payload bytes stay in place, which at 100 TB is " +
        "the difference between shuffling terabytes and megabytes."),

    QueryDef(
      "media_feature_extract",
      (s, d) => MediaSource.extractFeatures(MediaSource.media(s, d)).toDF()
        .select(col("mediaId").as("media_id"), col("kind"),
          col("byteLen").as("byte_len"),
          col("f0"), col("f1"), col("f2"), col("f3")),
      Some("""SELECT doc_id AS media_id,
        | ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
        | octet_length(encode(text))::BIGINT AS byte_len,
        | unicode(substr(text, 1, 1))::BIGINT AS f0,
        | unicode(substr(text, 2, 1))::BIGINT AS f1,
        | unicode(substr(text, 3, 1))::BIGINT AS f2,
        | list_reduce(list_prepend(0::BIGINT,
        |   list_transform(string_split_regex(text, ''),
        |                  c -> unicode(c)::BIGINT)),
        |   (a, b) -> (a + b) % 100000) AS f3
        |FROM documents""".stripMargin),
      "Decode / feature-extract as a per-partition mapPartitions pass over " +
        "Dataset[MediaRecord] — decoder instantiated once per partition, " +
        "records streamed in batches; decode itself stubbed " +
        "deterministically (no media libs in-container)."),

    QueryDef(
      "media_decode_bmp",
      (s, d) => MediaSource.decodeBmpFeatures(MediaSource.bmpMedia(s, d))
        .filter(col("valid"))
        .select(col("media_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          expr("(1000 * sum_r) div (width * height)").as("mean_r_e3")),
      Some("""SELECT doc_id AS media_id,
        | (doc_id % 7 + 2)::BIGINT AS width,
        | (doc_id % 5 + 2)::BIGINT AS height,
        | sum((doc_id * 7 + x.i * 3 + y.i * 5) % 256)::BIGINT AS sum_r,
        | sum((doc_id * 11 + x.i + 2 * y.i) % 256)::BIGINT AS sum_g,
        | sum((doc_id + 13 * x.i + y.i) % 256)::BIGINT AS sum_b,
        | ((1000 * sum((doc_id * 7 + x.i * 3 + y.i * 5) % 256))
        |   // ((doc_id % 7 + 2) * (doc_id % 5 + 2)))::BIGINT AS mean_r_e3
        |FROM documents,
        | (SELECT range AS i FROM range(0, 8)) x,
        | (SELECT range AS i FROM range(0, 6)) y
        |WHERE x.i < doc_id % 7 + 2 AND y.i < doc_id % 5 + 2
        |GROUP BY doc_id""".stripMargin),
      "REAL media decode, stub replaced for one concrete format: the " +
        "payload column carries genuine 24-bpp BMP bytes (headers, " +
        "4-byte row padding, bottom-up BGR), built executor-side from " +
        "a deterministic pixel function of doc_id; the feature pass " +
        "parses them with the pure-Scala decoder (MediaCodec.decodeBmp," +
        " mapPartitions, per-partition instance) and aggregates the " +
        "DECODED raster's per-channel sums. The oracle recomputes the " +
        "same sums from the generating formula, so any header, " +
        "padding, row-order or channel-order bug in encode OR decode " +
        "breaks the hash match (BmpCodecSpec pins the codec pairwise). " +
        "Payload bytes stay in the value column end to end — only " +
        "(id, 6 longs) ever leave the map task."),

    QueryDef(
      "media_decode_wav",
      (s, d) => MediaSource.decodeWavFeatures(MediaSource.wavMedia(s, d))
        .filter(col("valid"))
        .select(col("media_id"), col("n_samples"), col("duration_ms"),
          col("peak"), col("energy"), col("zero_crossings")),
      Some("""WITH s AS (
        |  SELECT doc_id, i,
        |    ((doc_id * 31 + i * 17) % 4001) - 2000 AS v
        |  FROM documents,
        |    LATERAL (SELECT unnest(range(0, doc_id % 50 + 20)) AS i) r),
        |f AS (
        |  SELECT doc_id, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id AS media_id,
        |  (doc_id % 50 + 20)::BIGINT AS n_samples,
        |  ((doc_id % 50 + 20) * 1000 // 8000)::BIGINT AS duration_ms,
        |  max(abs(v))::BIGINT AS peak,
        |  sum(v * v)::BIGINT AS energy,
        |  sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) != (pv >= 0))
        |      THEN 1 ELSE 0 END)::BIGINT AS zero_crossings
        |FROM f GROUP BY doc_id""".stripMargin),
      "REAL audio decode — the WAV counterpart of media_decode_bmp, " +
        "completing the genuine image+audio decoder pair: payloads " +
        "are actual RIFF/WAVE 16-bit PCM mono bytes built " +
        "executor-side from a fixed integer waveform of doc_id, and " +
        "the feature pass parses them with the pure-Scala " +
        "chunk-walking decoder (MediaCodec.decodeWav — fixed offsets " +
        "would break on real files carrying LIST/fact chunks) then " +
        "computes duration, peak, energy and zero-crossings from the " +
        "DECODED samples.  The oracle recomputes the same features " +
        "from the generating waveform, so any header, chunk-size, " +
        "endianness or sign-extension bug in encode OR decode breaks " +
        "the hash match (WavCodecSpec pins the codec pairwise).  " +
        "Payload bytes never shuffle; only (id, 6 longs) leave the " +
        "map task."),

    QueryDef(
      "media_resize",
      (s, d) => {
        // Thumbnail to fit 64x64 preserving aspect ratio: integer
        // fixed-point scale (1e4) so both engines agree exactly.  The
        // pixel resample itself would run in the decodeStub slot
        // (mapPartitions, per-partition decoder); the plan computes
        // target geometry + output byte size — the part the engine owns.
        // Column `/` on longs is IEEE double division; `div` keeps the
        // arithmetic in exact integers, matching DuckDB's `//`.
        MediaSource.media(s, d).toDF()
          .select(col("mediaId").as("media_id"),
            col("meta.width").cast("long").as("width"),
            col("meta.height").cast("long").as("height"))
          .withColumn("scale_e4",
            expr("least(640000 div width, 640000 div height)"))
          .select(col("media_id"), col("width"), col("height"),
            expr("(width * scale_e4) div 10000").as("out_w"),
            expr("(height * scale_e4) div 10000").as("out_h"),
            expr("((width * scale_e4) div 10000) * " +
              "((height * scale_e4) div 10000) * 3").as("out_bytes"))
      },
      Some("""SELECT doc_id AS media_id,
        | (n_chars % 640 + 16)::BIGINT AS width,
        | (n_chars % 480 + 16)::BIGINT AS height,
        | ((n_chars % 640 + 16) * least(640000 // (n_chars % 640 + 16),
        |                               640000 // (n_chars % 480 + 16))
        |   // 10000)::BIGINT AS out_w,
        | ((n_chars % 480 + 16) * least(640000 // (n_chars % 640 + 16),
        |                               640000 // (n_chars % 480 + 16))
        |   // 10000)::BIGINT AS out_h,
        | (((n_chars % 640 + 16) * least(640000 // (n_chars % 640 + 16),
        |                                640000 // (n_chars % 480 + 16))
        |    // 10000)
        |  * ((n_chars % 480 + 16) * least(640000 // (n_chars % 640 + 16),
        |                                  640000 // (n_chars % 480 + 16))
        |     // 10000) * 3)::BIGINT AS out_bytes
        |FROM documents""".stripMargin),
      "Resize planning for media payloads: fit-to-64x64 target geometry " +
        "via fixed-point integer scale + RGB output size. The pixel " +
        "resample rides the decodeStub mapPartitions slot; geometry " +
        "stays a narrow codegen'd projection."),

    QueryDef(
      "media_frame_sample",
      (s, d) => MediaSource.sampleFrames(s, d),
      Some("""SELECT doc_id AS media_id,
        | f.frame_idx::BIGINT AS frame_idx
        |FROM documents
        |CROSS JOIN (SELECT range AS frame_idx FROM range(0, 64)) f
        |WHERE doc_id % 3 = 2
        |  AND f.frame_idx <= (n_chars * 40) // 1000""".stripMargin),
      "Frame sampling at 1 fps from video metadata: explode(sequence) — " +
        "a generator, no shuffle; downstream per-frame decode would ride " +
        "the same mapPartitions path as media_feature_extract."),
  )
}
