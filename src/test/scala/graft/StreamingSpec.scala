package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Sessionize
import graft.streaming.Sessionize.FileEvent

/** Streaming sessionization (SURVEY.md §2.10): group-of-5 assembly with
  * event-time timeout flush, driven through a MemoryStream.
  */
class StreamingSpec extends SparkSpec {

  private def ev(pose: String, slot: Int, sec: Long) =
    FileEvent(pose, slot, s"${pose}_$slot.JPG", new Timestamp(sec * 1000))

  test("completeGroups emits full groups immediately, flushes partials on watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FileEvent]
    val out = Sessionize.completeGroups(input.toDS(), groupSize = 5,
      gapSeconds = 12)
    val query = out.writeStream
      .format("memory").queryName("groups").outputMode(OutputMode.Append())
      .start()
    try {
      // pose 0: all five exposures; pose 1: only three
      input.addData((0 until 5).map(s => ev("0", s, 100 + s)) ++
        (0 until 3).map(s => ev("1", s, 110 + s)))
      query.processAllAvailable()
      val afterBatch1 = spark.table("groups").as[Sessionize.PoseGroup]
        .collect()
      assert(afterBatch1.map(_.poseId).toSet == Set("0"))
      assert(afterBatch1.head.complete && afterBatch1.head.n == 5)
      assert(afterBatch1.head.paths == (0 until 5).map(s => s"0_$s.JPG"))

      // advance the watermark far past pose 1's last event + 12s
      input.addData(ev("2", 0, 500))
      query.processAllAvailable()
      input.addData(ev("2", 1, 600)) // one more to trigger timeout sweep
      query.processAllAvailable()
      val flushed = spark.table("groups").as[Sessionize.PoseGroup]
        .collect().filter(_.poseId == "1")
      assert(flushed.length == 1, "partial group must flush on timeout")
      assert(!flushed.head.complete && flushed.head.n == 3)
    } finally query.stop()
  }

  test("binaryFile directory stream feeds group assembly end-to-end") {
    // the reference's actual ingestion: a camera drops {pose}_{slot}.JPG
    // files into a directory over time (SURVEY §2.10 source side)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest")
    def drop(pose: String, slot: Int): Unit =
      java.nio.file.Files.write(dir.resolve(s"${pose}_$slot.JPG"),
        s"fake-jpeg-$pose-$slot".getBytes)
    (0 until 5).foreach(drop("0", _))
    (0 until 2).foreach(drop("1", _))

    val files = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(dir.toString)
    val events = files.select(
      regexp_extract(col("path"), "([^/]+)_([0-9]+)\\.JPG$", 1).as("poseId"),
      regexp_extract(col("path"), "([^/]+)_([0-9]+)\\.JPG$", 2)
        .cast("int").as("slot"),
      col("path"), col("modificationTime").as("ts"))
      .as[FileEvent]
    val q = Sessionize.completeGroups(events).writeStream
      .format("memory").queryName("ingest")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val groups = spark.table("ingest").as[Sessionize.PoseGroup].collect()
      val full = groups.filter(_.poseId == "0")
      assert(full.length == 1 && full.head.complete && full.head.n == 5,
        s"expected pose 0 complete, got ${groups.mkString(";")}")
      assert(full.head.paths.map(_.split('/').last).sorted ==
        (0 until 5).map(s => s"0_$s.JPG"))
      // pose 1 (2 files) must still be held in state, not emitted
      assert(!groups.exists(_.poseId == "1"))
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FileEvent]
    val q = Sessionize.dedupedEvents(input.toDS(), withinSeconds = 60)
      .writeStream
      .format("memory").queryName("deduped")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // slot 1 delivered three times (same key, retried upload)
      input.addData(Seq(ev("7", 0, 100), ev("7", 1, 101),
        ev("7", 1, 101), ev("7", 1, 102)))
      q.processAllAvailable()
      val rows = spark.table("deduped").as[FileEvent].collect()
      assert(rows.length == 2, s"expected 2 unique events, got ${rows.toSeq}")
      assert(rows.map(e => (e.poseId, e.slot)).toSet ==
        Set(("7", 0), ("7", 1)))
    } finally q.stop()
  }

  test("HDR merge runs as a foreachBatch stage over completed groups") {
    // §2.10 sink side: each completed 5-exposure group is merged to HDR
    // radiance inside foreachBatch — the external hdrgen stage
    // (handlehdrgen.py:30-33) as a streaming Spark stage
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.Hdr
    val bracket = Hdr.ExposureBracket
    val zs = Seq(0.5, 0.25, 0.4, 0.7, 0.9)
    val pixels = (for (p <- Seq("0", "1"); s <- 0 until 5) yield {
      val scale = if (p == "0") 2.0 else 4.0
      (s"${p}_$s.JPG", s + 1, bracket(s), Seq(zs(s), zs(s) / scale))
    }).toDF("path", "slot", "t", "px")
    val input = MemoryStream[FileEvent]
    val merged =
      scala.collection.mutable.ArrayBuffer[(String, Seq[Double])]()
    val q = Sessionize.completeGroups(input.toDS())
      .filter(_.complete)
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Sessionize.PoseGroup],
         _: Long) =>
          val exposures = batch.toDF()
            .select(col("poseId"), explode(col("paths")).as("path"))
            .join(pixels, "path")
          Hdr.mergeGroups(exposures, "poseId", "slot", "t", "px")
            .collect()
            .foreach(r => merged.synchronized {
              merged += (r.getString(0) ->
                r.getAs[scala.collection.Seq[Double]]("radiance").toSeq)
            })
      }
      .start()
    try {
      // batch 1: group 0 completes, group 1 is still partial — radiance
      // must appear for 0 only
      input.addData((0 until 5).map(s => ev("0", s, 100 + s)) ++
        (0 until 3).map(s => ev("1", s, 200 + s)))
      q.processAllAvailable()
      assert(merged.synchronized(merged.map(_._1).toSeq) == Seq("0"),
        "incomplete group must not emit radiance")
      // batch 2: group 1's last two exposures arrive — its radiance
      // appears in THIS batch (per-batch emission as groups complete)
      input.addData((3 until 5).map(s => ev("1", s, 203 + s)))
      q.processAllAvailable()
    } finally q.stop()
    assert(merged.map(_._1).sorted.toSeq == Seq("0", "1"))
    // scalar reference of the merge formula per channel
    def expected(chan: Seq[Double]): Double = {
      val terms = chan.zip(bracket).map { case (z, t) =>
        val w = math.max(1e-3, 1.0 - math.abs(2 * z - 1)); (w * z / t, w)
      }
      terms.map(_._1).sum / terms.map(_._2).sum
    }
    val byPose = merged.toMap
    val g0 = byPose("0")
    assert(math.abs(g0(0) - expected(zs)) < 1e-12)
    assert(math.abs(g0(1) - expected(zs.map(_ / 2))) < 1e-12)
    val g1 = byPose("1")
    assert(math.abs(g1(0) - expected(zs)) < 1e-12)
    assert(math.abs(g1(1) - expected(zs.map(_ / 4))) < 1e-12)
  }

  test("sessionGaps (batch form) splits on gaps over the threshold") {
    import spark.implicits._
    val df = Seq(
      ("u1", new Timestamp(1000L)), ("u1", new Timestamp(5000L)),
      ("u1", new Timestamp(60000L)), // 55s gap -> new session
      ("u2", new Timestamp(2000L))
    ).toDF("user", "ts")
    val sessions = Sessionize.sessionGaps(df, "ts", 12, Seq("user"))
      .orderBy("user", "start_ts").collect()
    assert(sessions.length == 3)
    assert(sessions(0).getAs[Long]("n") == 2) // u1 first session
    assert(sessions(1).getAs[Long]("n") == 1) // u1 second session
    assert(sessions(2).getAs[Long]("n") == 1) // u2
  }
}
