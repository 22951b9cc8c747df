package graft

import graft.sources.{MediaCodec, MediaSource}
import org.apache.spark.sql.functions._

/** The pure-Scala WAV codec behind media_decode_wav: exact round-trip,
  * chunk-walk robustness, and malformed-input safety (a corrupt payload
  * must decode to None, never throw). */
class WavCodecSpec extends SparkSpec {

  private def wave(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => ((id * 31 + i * 17) % 4001 - 2000).toShort)

  test("encode/decode round-trips rate and samples exactly") {
    for (id <- 0L to 8L; n <- Seq(1, 2, 33, 64)) {
      val s = wave(id, n)
      val Some((rate, out)) = MediaCodec.decodeWav(MediaCodec.encodeWav(8000, s))
      assert(rate === 8000)
      assert(out.toSeq === s.toSeq)
    }
  }

  test("negative samples survive the int16 little-endian round trip") {
    val s = Array[Short](-1, -32768, 32767, 0, -2000, 1999)
    val Some((_, out)) = MediaCodec.decodeWav(MediaCodec.encodeWav(44100, s))
    assert(out.toSeq === s.toSeq)
  }

  test("decoder walks chunk lists: an extra chunk before data still parses") {
    val s = wave(3L, 10)
    val base = MediaCodec.encodeWav(8000, s)
    // splice a 6-byte LIST chunk (odd size -> pad byte) between the
    // fmt and data chunks, fixing up the RIFF size
    val extra = Array[Byte]('L', 'I', 'S', 'T', 7, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 'y', 'z', 0)
    val out = new Array[Byte](base.length + extra.length)
    System.arraycopy(base, 0, out, 0, 36)
    System.arraycopy(extra, 0, out, 36, extra.length)
    System.arraycopy(base, 36, out, 36 + extra.length, base.length - 36)
    val riffSize = (out.length - 8).toLong
    (0 until 4).foreach(i => out(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte)
    val Some((rate, got)) = MediaCodec.decodeWav(out)
    assert(rate === 8000)
    assert(got.toSeq === s.toSeq)
  }

  test("malformed payloads decode to None, never throw") {
    val good = MediaCodec.encodeWav(8000, wave(1L, 12))
    assert(MediaCodec.decodeWav(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decodeWav(good.take(20)).isEmpty)          // truncated
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(MediaCodec.decodeWav(badMagic).isEmpty)
    val stereo = good.clone(); stereo(22) = 2                     // channels=2
    assert(MediaCodec.decodeWav(stereo).isEmpty)
    val eightBit = good.clone(); eightBit(34) = 8                 // bits=8
    assert(MediaCodec.decodeWav(eightBit).isEmpty)
    val compressed = good.clone(); compressed(20) = 2             // non-PCM
    assert(MediaCodec.decodeWav(compressed).isEmpty)
    val lyingChunk = good.clone()                                 // data size
    lyingChunk(40) = (lyingChunk(40) + 64).toByte                 //  past EOF
    assert(MediaCodec.decodeWav(lyingChunk).isEmpty)
  }

  test("media_decode_wav rows are all valid and feature-complete") {
    val f = MediaSource.decodeWavFeatures(MediaSource.wavMedia(spark, sfDir))
    assert(f.filter(!col("valid")).count() === 0)
    assert(f.filter(col("peak") > 2000).count() === 0)
    assert(f.filter(col("zero_crossings") >= col("n_samples")).count() === 0)
    assert(f.filter(col("energy") <
      col("peak") * col("peak")).count() === 0)
    assert(f.count() === Tables.documents(spark, sfDir).count())
  }
}
