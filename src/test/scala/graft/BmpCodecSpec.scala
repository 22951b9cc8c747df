package graft

import graft.sources.MediaCodec

/** The pure-Scala BMP codec behind media_decode_bmp: exact round-trip
  * across padded and unpadded widths, top-down (negative height)
  * decode, and total rejection of malformed input — a corrupt payload
  * is a skipped row, never a task failure. */
class BmpCodecSpec extends SparkSpec {

  private def pix(x: Int, y: Int): (Int, Int, Int) =
    ((x * 31 + y * 7) % 256, (x + y * 13) % 256, (x * 5 + y) % 256)

  test("encode -> decode round-trips pixels exactly for every row " +
    "padding case (widths 1..8)") {
    for (w <- 1 to 8; h <- Seq(1, 3, 5)) {
      val bytes = MediaCodec.encodeBmp(w, h, pix)
      // row stride must be 4-byte aligned: total = 54 + stride*h
      val stride = (w * 3 + 3) / 4 * 4
      assert(bytes.length === 54 + stride * h, s"w=$w h=$h size")
      val img = MediaCodec.decodeBmp(bytes)
        .getOrElse(fail(s"w=$w h=$h did not decode"))
      assert(img.width === w && img.height === h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = pix(x, y)
        val off = (y * w + x) * 3
        assert((img.rgb(off) & 0xff) === r, s"R at ($x,$y) w=$w h=$h")
        assert((img.rgb(off + 1) & 0xff) === g, s"G at ($x,$y)")
        assert((img.rgb(off + 2) & 0xff) === b, s"B at ($x,$y)")
      }
    }
  }

  test("top-down BMPs (negative height) decode to the same raster") {
    val up = MediaCodec.encodeBmp(5, 4, pix)
    // flip to top-down: negate height, reverse the row order in place
    val down = up.clone()
    val stride = (5 * 3 + 3) / 4 * 4
    val hNeg = -4
    (0 until 4).foreach { i =>
      down(22 + i) = ((hNeg >> (8 * i)) & 0xff).toByte
    }
    (0 until 4).foreach { y =>
      System.arraycopy(up, 54 + (3 - y) * stride, down, 54 + y * stride,
        stride)
    }
    val a = MediaCodec.decodeBmp(up).get
    val b = MediaCodec.decodeBmp(down).get
    assert(a.rgb.toSeq === b.rgb.toSeq)
  }

  test("malformed payloads are rejected, never thrown") {
    val good = MediaCodec.encodeBmp(4, 4, pix)
    assert(MediaCodec.decodeBmp(Array.empty[Byte]).isEmpty)
    assert(MediaCodec.decodeBmp("not a bitmap".getBytes).isEmpty)
    assert(MediaCodec.decodeBmp(good.take(53)).isEmpty) // truncated header
    assert(MediaCodec.decodeBmp(good.take(60)).isEmpty) // truncated rows
    val wrongMagic = good.clone(); wrongMagic(0) = 'X'
    assert(MediaCodec.decodeBmp(wrongMagic).isEmpty)
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(MediaCodec.decodeBmp(bpp8).isEmpty)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8 compression
    assert(MediaCodec.decodeBmp(rle).isEmpty)
    // dataOffset inside the header: would decode header bytes as
    // pixels if accepted (offset 0 keeps every bound check happy on a
    // payload this small — the reject must come from the offset floor)
    val hdrOverlap = good.clone(); hdrOverlap(10) = 0
    assert(MediaCodec.decodeBmp(hdrOverlap).isEmpty)
    // height = Int.MinValue: its 32-bit abs is still negative, which
    // sails through every PRODUCT-based bound (negative < limit) and
    // crashes the pixel-array allocation unless abs is taken in Long
    val hMin = good.clone()
    val mv = Int.MinValue
    (0 until 4).foreach(i => hMin(22 + i) = ((mv >> (8 * i)) & 0xff).toByte)
    assert(MediaCodec.decodeBmp(hMin).isEmpty)
  }

  test("the media_decode_bmp payloads are genuine BMPs and every row " +
    "decodes") {
    val m = graft.sources.MediaSource
      .bmpMedia(spark, sfDir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(bytes(0) == 'B' && bytes(1) == 'M')
      val img = MediaCodec.decodeBmp(bytes)
      assert(img.nonEmpty, s"media_id ${r.getLong(0)} failed decode")
    }
  }
}
