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

/** A decoded raster: top-down row-major RGB triplets. */
final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

object MediaCodec {

  // ------------------------------------------------------------------
  // Real decode path: 24-bpp uncompressed BMP (windows BITMAPINFOHEADER),
  // parsed in pure Scala — no image libs needed.  This replaces the
  // stub for one concrete format: media_decode_bmp synthesizes real BMP
  // bytes, ships them through the binary payload column, and extracts
  // features from the ACTUAL pixels the decoder returns.
  // ------------------------------------------------------------------

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt

  /** Encode a 24-bpp bottom-up BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + BGR rows padded to 4-byte boundaries.
    * `pixel(x, y)` returns (r, g, b) for the TOP-DOWN coordinate. */
  def encodeBmp(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val fileSize = 54 + imageSize
    val out = new Array[Byte](fileSize)
    def pu16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def pu32(off: Int, v: Long): Unit = (0 until 4).foreach { i =>
      out(off + i) = ((v >> (8 * i)) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    pu32(2, fileSize); pu32(10, 54)
    pu32(14, 40); pu32(18, width); pu32(22, height)
    pu16(26, 1); pu16(28, 24); pu32(30, 0); pu32(34, imageSize)
    pu32(38, 2835); pu32(42, 2835); pu32(46, 0); pu32(50, 0)
    var off = 54
    // bottom-up: last raster row first, BGR byte order
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(off) = b.toByte; out(off + 1) = g.toByte; out(off + 2) = r.toByte
        off += 3; x += 1
      }
      off += pad
      y -= 1
    }
    out
  }

  /** Decode a 24-bpp uncompressed BMP; None for anything malformed
    * (wrong magic, truncated, compressed, non-24-bpp, bad offsets) —
    * a corrupt payload must be skippable, never fatal, same contract
    * as the JSONL sources' malformed-line handling. */
  def decodeBmp(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = u32(bytes, 10)
    val hdrSize = u32(bytes, 14)
    if (hdrSize < 40) return None
    // pixel data must start past the 14-byte file header + DIB header;
    // a smaller offset would silently decode header bytes as pixels
    if (dataOffset < 14L + hdrSize) return None
    val width = i32(bytes, 18)
    val heightRaw = i32(bytes, 22)
    val bottomUp = heightRaw >= 0
    // abs in LONG space: math.abs(Int.MinValue) stays negative, which
    // would slip past every product-based bound below and crash the
    // array allocation — a corrupt payload must never be fatal
    val heightL = math.abs(heightRaw.toLong)
    val bitCount = u16(bytes, 28)
    val compression = u32(bytes, 30)
    if (width <= 0 || heightL == 0L || bitCount != 24 || compression != 0L)
      return None
    if (width.toLong * heightL > (1L << 24)) return None // bounded decode
    val height = heightL.toInt // <= 2^24 by the bound above
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    if (dataOffset + stride.toLong * height > bytes.length) return None
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val src = dataOffset.toInt + srcRow * stride
      var x = 0
      while (x < width) {
        val d = (y * width + x) * 3
        rgb(d) = bytes(src + x * 3 + 2)     // R
        rgb(d + 1) = bytes(src + x * 3 + 1) // G
        rgb(d + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(width, height, rgb))
  }
  // ------------------------------------------------------------------
  // Real decode path #2: RIFF/WAVE 16-bit PCM mono, parsed in pure
  // Scala — completes the image (BMP) + audio (WAV) pair of genuine
  // byte-level decoders behind the multimodal stub.
  // ------------------------------------------------------------------

  /** Encode a 16-bit PCM mono WAV: RIFF header + "fmt " chunk (PCM) +
    * "data" chunk of little-endian int16 samples. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    def tag(off: Int, s: String): Unit =
      (0 until 4).foreach(i => out(off + i) = s.charAt(i).toByte)
    def pu32(off: Int, v: Long): Unit = (0 until 4).foreach { i =>
      out(off + i) = ((v >> (8 * i)) & 0xff).toByte
    }
    def pu16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    tag(0, "RIFF"); pu32(4, 36L + dataBytes); tag(8, "WAVE")
    tag(12, "fmt "); pu32(16, 16)
    pu16(20, 1)                    // PCM
    pu16(22, 1)                    // mono
    pu32(24, sampleRate)
    pu32(28, sampleRate.toLong * 2) // byte rate (mono 16-bit)
    pu16(32, 2)                    // block align
    pu16(34, 16)                   // bits per sample
    tag(36, "data"); pu32(40, dataBytes)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(45 + 2 * i) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decode a 16-bit PCM mono WAV by WALKING the chunk list (a real
    * file may carry LIST/INFO or fact chunks between fmt and data, so
    * fixed offsets are wrong for anything but our own encoder).  None
    * for malformed input — wrong magic, truncated, compressed,
    * non-16-bit, multi-channel, missing chunks — never a throw. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes.length < 44) return None
    def tagAt(off: Int, s: String): Boolean =
      (0 until 4).forall(i => bytes(off + i) == s.charAt(i).toByte)
    if (!tagAt(0, "RIFF") || !tagAt(8, "WAVE")) return None
    var off = 12
    var rate = -1
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val sz = u32(bytes, off + 4)
      val body = off + 8
      if (body + sz > bytes.length) return None // truncated chunk
      if (tagAt(off, "fmt ")) {
        if (sz < 16) return None
        val fmt = u16(bytes, body)
        val channels = u16(bytes, body + 2)
        val bits = u16(bytes, body + 14)
        if (fmt != 1 || channels != 1 || bits != 16) return None
        rate = u32(bytes, body + 4).toInt
        if (rate <= 0) return None
      } else if (tagAt(off, "data")) {
        dataOff = body; dataLen = sz
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      off = body + sz.toInt + (sz % 2).toInt
    }
    if (rate < 0 || dataOff < 0 || dataLen % 2 != 0) return None
    if (dataLen > (1L << 26)) return None // bounded decode
    val n = (dataLen / 2).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((bytes(dataOff + 2 * i) & 0xff) |
        (bytes(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Some((rate, samples))
  }

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

  /** Real-format media: synthesize genuine 24-bpp BMP payloads whose
    * pixels derive deterministically from doc_id ((r,g,b) are fixed
    * affine functions of (id, x, y) mod 256, w = id%7+2, h = id%5+2).
    * The bytes in the payload column are REAL BMPs — headers, padding,
    * bottom-up BGR rows — so the decode pass exercises an actual
    * parser, not arithmetic on the generator's inputs. */
  def bmpMedia(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 7 + 2).toInt; val h = (id % 5 + 2).toInt
        val bytes = MediaCodec.encodeBmp(w, h, (x, y) => (
          ((id * 7 + x * 3 + y * 5) % 256).toInt,
          ((id * 11 + x + 2 * y) % 256).toInt,
          ((id + 13 * x + y) % 256).toInt))
        (id, bytes)
      }.toDF("media_id", "payload")
  }

  /** Decode the BMP payloads (mapPartitions, parser instantiated
    * per-partition) and extract per-channel pixel statistics from the
    * DECODED raster.  Malformed payloads yield a null-feature row
    * (valid = false), never a task failure. */
  def decodeBmpFeatures(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaCodec.decodeBmp(bytes) match {
          case Some(img) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < img.rgb.length) {
              sr += img.rgb(i) & 0xff
              sg += img.rgb(i + 1) & 0xff
              sb += img.rgb(i + 2) & 0xff
              i += 3
            }
            (id, img.width.toLong, img.height.toLong, sr, sg, sb, true)
          case None => (id, 0L, 0L, 0L, 0L, 0L, false)
        }
      })
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "valid")
  }

  /** Real-format audio: synthesize genuine RIFF/WAVE 16-bit PCM mono
    * payloads (8 kHz; n = id%50+20 samples; sample i is the fixed
    * integer waveform ((id*31 + i*17) % 4001) - 2000).  The payload
    * column carries REAL WAV bytes — RIFF header, fmt chunk, data
    * chunk, little-endian int16 — so the decode pass exercises an
    * actual chunk-walking parser. */
  def wavMedia(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val n = (id % 50 + 20).toInt
        val samples = Array.tabulate(n)(i =>
          ((id * 31 + i * 17) % 4001 - 2000).toShort)
        (id, MediaCodec.encodeWav(8000, samples))
      }.toDF("media_id", "payload")
  }

  /** Decode the WAV payloads (mapPartitions, parser per partition) and
    * extract audio features from the DECODED samples: duration, peak
    * amplitude, energy, zero-crossing count.  Malformed payloads yield
    * a null-feature row (valid = false), never a task failure. */
  def decodeWavFeatures(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaCodec.decodeWav(bytes) match {
          case Some((rate, samples)) =>
            var peak = 0L; var energy = 0L; var zc = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toLong
              val a = math.abs(v)
              if (a > peak) peak = a
              energy += v * v
              if (i > 0 && ((v >= 0) != (samples(i - 1) >= 0))) zc += 1
              i += 1
            }
            (id, samples.length.toLong,
              samples.length.toLong * 1000L / rate, peak, energy, zc, true)
          case None => (id, 0L, 0L, 0L, 0L, 0L, false)
        }
      })
      .toDF("media_id", "n_samples", "duration_ms", "peak", "energy",
        "zero_crossings", "valid")
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
