package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns plus typed metadata (SURVEY.md §2.8; reference
  * decodes with cv2 at pixel_processing.py:15, cut600.py:17).
  *
  * Decode is REAL for the reference's formats — JPEG (and PNG/BMP/GIF) via
  * the JDK's javax.imageio and Radiance-RGBE `.hdr` via a hand-rolled
  * reader, see [[Codecs]]; unknown or corrupt blobs fall back to the
  * deterministic stub so a bad file degrades instead of failing the
  * partition (act_img.py:287-289's try/except-skip).
  */
object Multimodal {

  /** Decoded-media metadata row. */
  case class MediaMeta(
      path: String,
      byteLen: Long,
      width: Int,
      height: Int,
      channels: Int,
      meanLuma: Double)

  /** STUB decoder — the fallback for blobs [[Codecs]] can't decode (and a
    * deterministic stand-in for codecs the JDK lacks, e.g. video):
    * fake dimensions/luminance derived from the bytes, same schema and
    * dataflow as the real decoders.
    */
  def decodeStub(path: String, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    def b(i: Int): Int = if (n == 0) 0 else bytes(((i % n) + n) % n) & 0xff
    // fake 4:3 geometry seeded by content, fake luma = mean of a byte stride
    val w = 160 + 16 * (b(0) % 8)
    val h = w * 3 / 4
    val stride = math.max(1, n / 256)
    val luma =
      if (n == 0) 0.0
      else (0 until n by stride).map(i => bytes(i) & 0xff).sum.toDouble /
        ((n + stride - 1) / stride)
    MediaMeta(path, n.toLong, w, h, 3, luma)
  }

  /** Decode a binaryFile-style DataFrame (path, content) to metadata rows.
    * mapPartitions keeps the decode batched per partition (one codec init
    * per partition, not per row) — the Spark-side shape a real decoder needs.
    */
  def decodeMeta(files: DataFrame): Dataset[MediaMeta] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (p, bytes) => Codecs.decode(p, bytes) }
      }
  }

  /** Expression-only binary metadata (no decode): length, magic, md5 —
    * fully codegen'd, content never leaves the scan.
    */
  def binaryMeta(files: DataFrame): DataFrame =
    files.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
      col("length"),
      substring(col("content"), 1, 4).cast("string").as("magic"),
      md5(col("content")).as("content_md5"))

  /** Frame sampling for video-like blobs: treat `content` as fixed-size
    * frames, keep every `everyNth` one — pure expression byte-slicing
    * (substring on binary), one output row per sampled frame. The frame
    * decode stays a stub (no codecs here); the partitioning, slicing and
    * explode shape are the real thing a video pipeline needs.
    */
  def sampleFrames(files: DataFrame, frameBytes: Int, everyNth: Int)
      : DataFrame = {
    val nFrames = floor(col("length") / frameBytes)
    val picks = sequence(lit(0), greatest(
      ceil(nFrames / everyNth).cast("int") - 1, lit(0)))
    files
      .filter(col("length") >= frameBytes)
      .select(col("path"),
        posexplode(transform(picks, i =>
          substring(col("content"),
            (i * everyNth * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .select(col("path"), col("frame_idx"),
        md5(col("frame")).as("frame_md5"), length(col("frame")).as("n"))
  }

  /** Resize stage: stub scale math over decoded metadata, real batched
    * mapPartitions dataflow (cut600.py:30-32's 800->640 analogue).
    */
  def resizeMeta(files: DataFrame, targetW: Int): Dataset[MediaMeta] = {
    val spark = files.sparkSession
    import spark.implicits._
    decodeMeta(files).map { m =>
      val scale = targetW.toDouble / m.width
      m.copy(width = targetW, height = (m.height * scale).toInt)
    }
  }

  /** Stub inference output: one row per input pose, carrying the generated
    * image's geometry and a deterministic content summary (a full 640x640
    * float tensor per row would be payload, not plumbing).
    */
  case class InferredImage(id: Long, width: Int, height: Int, mean: Double)

  /** Broadcast-weights + mapPartitions batch inference — the Spark shape
    * for the reference's VectorToImage generator (train.py:5-70: 6-dim
    * pose vector -> (1, 640, 640) image; model-only in the reference, it
    * never ran). The MODEL here is a deterministic stub (one seeded dense
    * layer + sigmoid standing in for the torch stack, which this
    * container lacks); the dataflow is the real thing batch inference
    * needs on a cluster:
    *
    *   - weights ship ONCE per executor via a broadcast variable, not
    *     per task and never per row;
    *   - the model is materialized from the broadcast once per PARTITION
    *     (the `bw.value` + init inside mapPartitions but outside the row
    *     loop — with torch this is where the module would be rebuilt and
    *     moved to the device);
    *   - rows then stream through the resident model.
    *
    * `initCounter`, when supplied, is bumped once per partition-level
    * model init — the test seam proving per-partition (not per-row) init.
    */
  def inferStub(poses: DataFrame, idCol: String, vecCols: Seq[String],
      outputSize: Int = 640, hidden: Int = 32,
      initCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[InferredImage] = {
    val spark = poses.sparkSession
    import spark.implicits._
    val d = vecCols.length
    // seeded stand-in for a trained checkpoint loaded driver-side
    val weights = Array.tabulate(hidden, d) { (i, j) =>
      val h = (i * 1315423911L + j * 2654435761L) & 0x7fffffffL
      h.toDouble / Int.MaxValue - 0.5
    }
    val bw = spark.sparkContext.broadcast(weights)
    val out = outputSize
    val rows = poses.select(col(idCol).cast("long").as("id"),
      array(vecCols.map(c => col(c).cast("double")): _*).as("v"))
      .as[(Long, Seq[Double])]
    rows.mapPartitions { it =>
      val w = bw.value // one model materialization per partition
      initCounter.foreach(_.add(1))
      it.map { case (id, v) =>
        var sum = 0.0
        var i = 0
        while (i < w.length) {
          var acc = 0.0
          var j = 0
          while (j < d) { acc += w(i)(j) * v(j); j += 1 }
          sum += 1.0 / (1.0 + math.exp(-acc)) // sigmoid head (train.py:60)
          i += 1
        }
        InferredImage(id, out, out, sum / w.length)
      }
    }
  }
}
