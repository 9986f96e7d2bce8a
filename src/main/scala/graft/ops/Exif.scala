package graft.ops

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** S8: EXIF metadata read (act_img.py:224-225 piexif.load;
  * calculate.py:109-130 ExposureTime rewrite). A minimal, dependency-free
  * JPEG APP1/TIFF IFD walker — enough to read the tag the reference
  * cares about (ExposureTime 0x829A, the 5-exposure bracket
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

  /** ExposureTime as (numerator, denominator), if present. */
  def exposureTime(bytes: Array[Byte]): Option[(Long, Long)] = {
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
    } yield (r.u32(o), r.u32(o + 4))
  }

  /** UDF form: binary content -> exposure seconds (num/den as double). */
  def exposureSecondsUdf: UserDefinedFunction = udf { (bytes: Array[Byte]) =>
    exposureTime(bytes).map { case (n, d) =>
      if (d == 0) 0.0 else n.toDouble / d.toDouble
    }
  }
}
