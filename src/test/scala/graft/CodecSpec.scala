package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.ops.{Codecs, Multimodal}

/** Real-decoder coverage for the S3 surface: a genuine JPEG round-trip
  * through javax.imageio, and Radiance-RGBE blobs exercising all three
  * scanline encodings (flat, old repeat marker, new RLE).
  */
class CodecSpec extends SparkSpec {

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", out), "JDK JPEG encoder missing")
    out.toByteArray
  }

  // one linear-light RGBE pixel used across the .hdr tests:
  // (64,128,32) mantissas, exponent 136 -> f = 2^0 = 1
  private val RgbeLuma = 0.2126 * 64 + 0.7152 * 128 + 0.0722 * 32

  private def hdrHeader(w: Int, h: Int): Array[Byte] =
    s"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y $h +X $w\n"
      .getBytes("ISO-8859-1")

  test("decodeLdr reads a real JPEG: true dimensions and mean luma") {
    val bytes = jpegBytes(40, 30, 0x808080) // uniform 128-gray
    val m = Codecs.decode("g.jpg", bytes)
    assert(m.width == 40 && m.height == 30 && m.channels == 3)
    assert(m.byteLen == bytes.length)
    // uniform gray survives JPEG quantization almost exactly
    assert(math.abs(m.meanLuma - 128.0) < 2.0, s"luma ${m.meanLuma}")
  }

  test("decodeRgbe: flat scanlines (width < 8 forces the flat form)") {
    val px = Array[Byte](64, -128, 32, -120) // e=136 unsigned
    val bytes = hdrHeader(4, 2) ++ Array.fill(8)(px).flatten
    val m = Codecs.decode("a.hdr", bytes)
    assert(m.width == 4 && m.height == 2 && m.channels == 3)
    assert(math.abs(m.meanLuma - RgbeLuma) < 1e-9, s"luma ${m.meanLuma}")
  }

  test("decodeRgbe: old-style (1,1,1,count) repeat marker") {
    val bytes = hdrHeader(4, 1) ++
      Array[Byte](64, -128, 32, -120) ++ // one real pixel
      Array[Byte](1, 1, 1, 3)            // repeat it 3 more times
    val m = Codecs.decode("b.hdr", bytes)
    assert(m.width == 4 && m.height == 1)
    assert(math.abs(m.meanLuma - RgbeLuma) < 1e-9, s"luma ${m.meanLuma}")
  }

  test("decodeRgbe: new-RLE component streams (runs and literals)") {
    val bytes = hdrHeader(8, 1) ++
      Array[Byte](2, 2, 0, 8) ++        // new-RLE scanline marker
      Array[Byte](-120, 64) ++          // R: run of 8 x 64   (136 = run 8)
      Array[Byte](-120, -128) ++        // G: run of 8 x 128
      (Array[Byte](8) ++ Array.fill[Byte](8)(32)) ++ // B: literal 8 x 32
      Array[Byte](-120, -120)           // E: run of 8 x 136
    val m = Codecs.decode("c.hdr", bytes)
    assert(m.width == 8 && m.height == 1)
    assert(math.abs(m.meanLuma - RgbeLuma) < 1e-9, s"luma ${m.meanLuma}")
  }

  test("decodeRgbe: old-style repeat run crossing a scanline boundary") {
    // w=4, h=2: one literal pixel, then a repeat of 7 covering the rest
    // of line 0 AND all of line 1 — legal in genuine old-format files
    val bytes = hdrHeader(4, 2) ++
      Array[Byte](64, -128, 32, -120) ++
      Array[Byte](1, 1, 1, 7)
    val m = Codecs.decode("cross.hdr", bytes)
    assert(m.width == 4 && m.height == 2 && m.channels == 3,
      "cross-scanline run must decode, not fall back to the stub")
    assert(math.abs(m.meanLuma - RgbeLuma) < 1e-9, s"luma ${m.meanLuma}")
  }

  test("decodeRgbe: overrunning repeat count degrades to the stub") {
    val bytes = hdrHeader(4, 1) ++
      Array[Byte](64, -128, 32, -120) ++
      Array[Byte](1, 1, 1, 9) // 9 > the 3 pixels remaining
    assert(Codecs.decode("bad.hdr", bytes) ==
      Multimodal.decodeStub("bad.hdr", bytes))
  }

  test("decompression-bomb PNG is capped from the header, before pixel alloc") {
    // minimal PNG: signature + IHDR declaring 50000x50000 (2.5 Gpx) —
    // a correct CRC so the reader trusts the header
    val bos = new ByteArrayOutputStream()
    bos.write(Array[Byte](-119, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes("US-ASCII"))
    val d = new java.io.DataOutputStream(ihdr)
    d.writeInt(50000); d.writeInt(50000) // width, height
    d.write(8); d.write(2); d.write(0); d.write(0); d.write(0)
    val chunk = ihdr.toByteArray
    val len = new java.io.DataOutputStream(bos)
    len.writeInt(chunk.length - 4)
    bos.write(chunk)
    val crc = new java.util.zip.CRC32()
    crc.update(chunk)
    len.writeInt(crc.getValue.toInt)
    val bomb = bos.toByteArray
    assert(Codecs.isLdrImage(bomb), "test blob must look like a PNG")
    assert(Codecs.decode("bomb.png", bomb) ==
      Multimodal.decodeStub("bomb.png", bomb))
  }

  test("decodeRgbe: zero exponent means zero radiance, not 2^-136") {
    val bytes = hdrHeader(4, 1) ++ Array.fill(4)(
      Array[Byte](-1, -1, -1, 0)).flatten
    assert(Codecs.decode("z.hdr", bytes).meanLuma == 0.0)
  }

  test("decodeMeta runs the real codecs distributed; junk falls back to stub") {
    import spark.implicits._
    val jpg = jpegBytes(16, 8, 0xffffff)
    val junk = Array.fill[Byte](64)(7)
    val df = Seq(("real.jpg", jpg), ("junk.bin", junk))
      .toDF("path", "content")
    val metas = Multimodal.decodeMeta(df).collect()
      .map(m => m.path -> m).toMap
    assert(metas("real.jpg").width == 16 && metas("real.jpg").height == 8)
    assert(metas("junk.bin") == Multimodal.decodeStub("junk.bin", junk))
  }

  test("corrupt bytes with a real magic degrade to the stub, not an error") {
    val broken = Array[Byte](-1, -40, 1, 2, 3) // JPEG SOI then garbage
    assert(Codecs.decode("x.jpg", broken) ==
      Multimodal.decodeStub("x.jpg", broken))
  }
}
