package graft.ops

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** S8: EXIF metadata read AND write (act_img.py:224-225 piexif.load;
  * calculate.py:109-130 ExposureTime rewrite — commented out in the
  * reference but its one write-side shape). A minimal, dependency-free
  * JPEG APP1/TIFF IFD walker — enough to read and stamp the tag the
  * reference cares about (ExposureTime 0x829A, the 5-exposure bracket
  * [1/200,1/800,1/400,1/100,1/50]). Runs as a scalar UDF over binaryFile
  * `content`; at scale the scan prunes `content` unless this column is
  * actually selected.
  */
object Exif {

  private val ExifIfdPointer = 0x8769
  private val ExposureTimeTag = 0x829a

  private final class Reader(b: Array[Byte], le: Boolean) {
    def u16(o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** Absolute offset of the ExposureTime RATIONAL payload (8 bytes:
    * u32 numerator, u32 denominator) plus the TIFF endianness, if the
    * tag exists. The shared walk behind both the read and write side.
    */
  private def locateExposure(bytes: Array[Byte]): Option[(Int, Boolean)] = {
    if (bytes == null || bytes.length < 4) return None
    // find the APP1 segment with the Exif header
    var i = 2 // skip SOI
    var tiff = -1
    while (tiff < 0 && i + 4 < bytes.length &&
      (bytes(i) & 0xff) == 0xff) {
      val marker = bytes(i + 1) & 0xff
      val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      if (marker == 0xe1 && i + 10 < bytes.length &&
        bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
        bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0)
        tiff = i + 10
      else i += 2 + len
    }
    if (tiff < 0 || tiff + 8 > bytes.length) return None
    val le = bytes(tiff) == 'I' && bytes(tiff + 1) == 'I'
    val be = bytes(tiff) == 'M' && bytes(tiff + 1) == 'M'
    if (!le && !be) return None
    val r = new Reader(bytes, le)

    def findTag(ifdOff: Long, tag: Int): Option[Long] = {
      val o = tiff + ifdOff.toInt
      if (o + 2 > bytes.length) return None
      val n = r.u16(o)
      (0 until n).iterator.map(k => o + 2 + 12 * k)
        .find(e => e + 12 <= bytes.length && r.u16(e) == tag)
        .map(e => r.u32(e + 8))
    }

    val ifd0 = r.u32(tiff + 4)
    for {
      exifIfd <- findTag(ifd0, ExifIfdPointer)
      valOff <- findTag(exifIfd, ExposureTimeTag)
      o = tiff + valOff.toInt
      if o + 8 <= bytes.length
    } yield (o, le)
  }

  /** ExposureTime as (numerator, denominator), if present. */
  def exposureTime(bytes: Array[Byte]): Option[(Long, Long)] = {
    val r0 = locateExposure(bytes)
    r0.map { case (o, le) =>
      val r = new Reader(bytes, le)
      (r.u32(o), r.u32(o + 4))
    }
  }

  private def writeU32(b: Array[Byte], o: Int, v: Long, le: Boolean): Unit =
    if (le) {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    } else {
      b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
      b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
    }

  /** A minimal little-endian APP1 Exif segment carrying only
    * IFD0 → ExifIFD → ExposureTime(num/den) — the piexif.dump shape for
    * an image with no (usable) Exif block yet.
    */
  private def minimalApp1(num: Long, den: Long): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val tiff =
      Array('I'.toByte, 'I'.toByte, 42.toByte, 0.toByte) ++ le32(8) ++
        // IFD0 @ 8: one entry, ExifIFDPointer (LONG) -> 26
        le16(1) ++ le16(ExifIfdPointer) ++ le16(4) ++ le32(1) ++ le32(26) ++
        le32(0) ++
        // ExifIFD @ 26: one entry, ExposureTime (RATIONAL) @ 44
        le16(1) ++ le16(ExposureTimeTag) ++ le16(5) ++ le32(1) ++ le32(44) ++
        le32(0) ++
        le32(num) ++ le32(den) // rational payload @ 44
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = payload.length + 2
    Array(0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
  }

  /** Byte range [start, end) of the first Exif APP1 segment, if any —
    * used to splice out a stale block (one that exists but lacks the
    * tag) rather than shadowing it with a second APP1, which would leave
    * external tools that merge or prefer later segments seeing
    * inconsistent Exif.
    */
  private def exifApp1Range(bytes: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 4 < bytes.length && (bytes(i) & 0xff) == 0xff) {
      val marker = bytes(i + 1) & 0xff
      val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      if (marker == 0xe1 && i + 10 < bytes.length &&
        bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
        bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0)
        return Some((i, math.min(i + 2 + len, bytes.length)))
      i += 2 + len
    }
    None
  }

  /** Write side (calculate.py:133-134 piexif ExposureTime assignment):
    * returns a copy of `bytes` with ExposureTime = num/den. If the tag
    * exists it is overwritten in place (all other Exif content kept); if
    * not — no APP1, foreign TIFF, or an Exif block without the tag — a
    * minimal APP1 replaces any stale Exif block (or is inserted right
    * after SOI), so the file carries exactly one Exif segment. Non-JPEG
    * bytes are returned unchanged.
    */
  def setExposureTime(bytes: Array[Byte], num: Long, den: Long): Array[Byte] =
    locateExposure(bytes) match {
      case Some((o, le)) =>
        val out = bytes.clone()
        writeU32(out, o, num, le)
        writeU32(out, o + 4, den, le)
        out
      case None =>
        if (bytes == null || bytes.length < 2 ||
          (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) bytes
        else exifApp1Range(bytes) match {
          case Some((s, e)) =>
            bytes.take(s) ++ minimalApp1(num, den) ++ bytes.drop(e)
          case None =>
            bytes.take(2) ++ minimalApp1(num, den) ++ bytes.drop(2)
        }
    }

  /** UDF form: binary content -> exposure seconds (num/den as double). */
  def exposureSecondsUdf: UserDefinedFunction = udf { (bytes: Array[Byte]) =>
    exposureTime(bytes).map { case (n, d) =>
      if (d == 0) 0.0 else n.toDouble / d.toDouble
    }
  }

  /** UDF form of the write side: stamp the slot's bracket exposure as
    * (seconds·1e6, 1e6) — the reference's exact rational convention
    * (calculate.py:133). Out-of-range slots pass bytes through.
    */
  def stampExposureUdf(exposures: Seq[Double]): UserDefinedFunction = {
    val exp = exposures.toArray // serializable closure capture
    udf { (bytes: Array[Byte], slot: Int) =>
      if (slot < 0 || slot >= exp.length) bytes
      else setExposureTime(bytes, math.round(exp(slot) * 1e6), 1000000L)
    }
  }
}
