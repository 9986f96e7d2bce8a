package graft.ops

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.ops.Multimodal.MediaMeta

/** Real image decoders for the S3 surface (reference decode:
  * pixel_processing.py:15 `cv2.imread`, cut600.py:17 `IMREAD_ANYDEPTH`),
  * dependency-free: JPEG/PNG/BMP/GIF via the JDK's javax.imageio, and a
  * hand-rolled Radiance-RGBE reader for `.hdr` (the format written by
  * hdrgen, handlehdrgen.py:30-33 — spec: Ward's RGBE, 8-bit mantissas +
  * shared exponent, new-RLE and flat scanline variants).
  *
  * Luma conventions: LDR (javax.imageio) uses Rec.601
  * (0.299 R + 0.587 G + 0.114 B) over 8-bit samples; HDR uses Rec.709
  * (0.2126 R + 0.7152 G + 0.0722 B) over linear floats, pixel value =
  * mantissa · 2^(e−136) as in Ward's rgbe.c.
  */
object Codecs {

  /** True for formats the JDK's ImageIO reads out of the box. */
  def isLdrImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (
      ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) || // JPEG
      ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') ||           // PNG
      (bytes(0) == 'B' && bytes(1) == 'M') ||                      // BMP
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'))     // GIF

  /** Radiance picture magic: `#?RADIANCE` or `#?RGBE`. */
  def isRadiance(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == '#' && bytes(1) == '?'

  /** Dispatching decode: real codec where the magic is recognized and the
    * payload parses; `Multimodal.decodeStub` otherwise (unknown or corrupt
    * blobs keep flowing as deterministic fakes instead of failing the
    * partition — the try/except-skip tolerance of act_img.py:287-289).
    */
  def decode(path: String, bytes: Array[Byte]): MediaMeta =
    try {
      if (isRadiance(bytes)) decodeRgbe(path, bytes)
      else if (isLdrImage(bytes)) decodeLdr(path, bytes)
      else Multimodal.decodeStub(path, bytes)
    } catch {
      case scala.util.control.NonFatal(_) => Multimodal.decodeStub(path, bytes)
    }

  /** Raster cap for LDR decode: 64 Mpx (~256 MB ARGB). A decompression
    * bomb (tiny payload declaring a huge raster) would otherwise OOM the
    * executor — and OutOfMemoryError is fatal, bypassing the
    * NonFatal-to-stub fallback that protects the partition.
    */
  val MaxLdrPixels: Long = 64L * 1024 * 1024

  /** JPEG/PNG/BMP/GIF via javax.imageio: true dimensions, color-model
    * channel count, Rec.601 mean luma over all pixels. Dimensions are
    * read from the format HEADER first and checked against MaxLdrPixels
    * before any pixel memory is allocated.
    */
  def decodeLdr(path: String, bytes: Array[Byte]): MediaMeta = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val img = try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no ImageIO reader for $path")
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val hw = reader.getWidth(0)
        val hh = reader.getHeight(0)
        require(hw > 0 && hh > 0 && hw.toLong * hh <= MaxLdrPixels,
          s"$path declares ${hw}x$hh, over the ${MaxLdrPixels}px decode cap")
        reader.read(0)
      } finally reader.dispose()
    } finally iis.close()
    require(img != null, s"ImageIO could not decode $path")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    MediaMeta(path, bytes.length.toLong, w, h,
      img.getColorModel.getNumColorComponents, sum / (w.toLong * h))
  }

  /** Full-raster LDR decode to a Rec.601 grayscale array (row-major,
    * 0..255) — the codec half of the scan→decode→detect pixel pipeline
    * (reference: cv2.imread + cvtColor(BGR2GRAY), pixel_processing.py:
    * 15-17). Same header-first dimension cap as decodeLdr; fails loudly
    * on undecodable payloads (the caller decides whether a bad frame
    * skips or aborts — px4 aborts, the reference's act_img.py:287-289
    * tolerance is the S3 decode() dispatcher's stub fallback).
    */
  def decodeGrayLdr(path: String, bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val img = try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no ImageIO reader for $path")
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val hw = reader.getWidth(0)
        val hh = reader.getHeight(0)
        require(hw > 0 && hh > 0 && hw.toLong * hh <= MaxLdrPixels,
          s"$path declares ${hw}x$hh, over the ${MaxLdrPixels}px decode cap")
        reader.read(0)
      } finally reader.dispose()
    } finally iis.close()
    require(img != null, s"ImageIO could not decode $path")
    val w = img.getWidth
    val h = img.getHeight
    (w, h, Corners.argbToGray(img.getRGB(0, 0, w, h, null, 0, w)))
  }

  /** Radiance RGBE `.hdr`: header (until the blank line) + `-Y h +X w`
    * resolution + h scanlines, each either new-RLE (w in [8,32767],
    * scanline starts 0x02 0x02 hi lo with hi<<8|lo == w: four
    * run/literal-encoded component streams) or flat RGBE quads with the
    * old-style (1,1,1,count) repeat marker. Mean luma is accumulated
    * streaming — the image is never materialized.
    */
  def decodeRgbe(path: String, bytes: Array[Byte]): MediaMeta = {
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      val s = new String(bytes, start, pos - start, "ISO-8859-1")
      pos += 1 // consume \n
      s
    }
    val magic = readLine()
    require(magic.startsWith("#?"), s"not a Radiance picture: $path")
    var line = readLine()
    while (line.nonEmpty) { // header ends at the first blank line
      require(pos < bytes.length, s"unterminated RGBE header: $path")
      line = readLine()
    }
    val res = readLine().trim.split("\\s+")
    require(res.length == 4 && res(0) == "-Y" && res(2) == "+X",
      s"unsupported RGBE orientation ${res.mkString(" ")}: $path")
    val h = res(1).toInt
    val w = res(3).toInt

    var sum = 0.0
    def addPixel(r: Int, g: Int, b: Int, e: Int): Unit =
      if (e != 0) {
        val f = math.pow(2.0, e - 136) // ldexp(1, e - (128+8)), rgbe.c
        sum += (0.2126 * r + 0.7152 * g + 0.0722 * b) * f
      }

    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }

    val scan = new Array[Int](4 * w)
    var y = 0
    while (y < h) {
      val newRle = w >= 8 && w <= 32767 && pos + 4 <= bytes.length &&
        (bytes(pos) & 0xff) == 2 && (bytes(pos + 1) & 0xff) == 2 &&
        (((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)) == w
      if (newRle) {
        pos += 4
        var c = 0
        while (c < 4) { // the four component streams, run/literal packets
          var x = 0
          while (x < w) {
            val n = u8()
            if (n > 128) { val v = u8(); var i = 0
              while (i < n - 128) { scan(4 * x + c) = v; x += 1; i += 1 } }
            else { var i = 0
              while (i < n) { scan(4 * x + c) = u8(); x += 1; i += 1 } }
          }
          c += 1
        }
        var x = 0
        while (x < w) {
          addPixel(scan(4 * x), scan(4 * x + 1), scan(4 * x + 2),
            scan(4 * x + 3))
          x += 1
        }
      } else {
        // old/flat format: decode the REST of the image as one pixel
        // stream — old-style (1,1,1,count) repeat runs legally cross
        // scanline boundaries in genuine old-format files, so the
        // previous pixel and run shift carry across lines. Total pixels
        // are tracked against w*h; an overrunning or truncated stream
        // throws and falls back to the stub via decode()'s catch.
        var remaining = (h - y).toLong * w
        var shift = 0
        var pr = 0; var pg = 0; var pb = 0; var pe = 0
        while (remaining > 0) {
          require(pos + 4 <= bytes.length, s"truncated RGBE pixels: $path")
          val r = u8(); val g = u8(); val b = u8(); val e = u8()
          if (r == 1 && g == 1 && b == 1) { // old repeat marker
            require(shift <= 24, s"malformed RGBE repeat chain: $path")
            val count = e.toLong << shift
            require(count <= remaining,
              s"RGBE repeat run overruns the image: $path")
            var i = 0L
            while (i < count) { addPixel(pr, pg, pb, pe); i += 1 }
            remaining -= count
            shift += 8
          } else {
            pr = r; pg = g; pb = b; pe = e
            addPixel(r, g, b, e)
            remaining -= 1
            shift = 0
          }
        }
        y = h - 1 // stream consumed the rest of the image
      }
      y += 1
    }
    MediaMeta(path, bytes.length.toLong, w, h, 3, sum / (w.toLong * h))
  }
}
