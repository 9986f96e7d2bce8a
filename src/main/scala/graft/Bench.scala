package graft
import org.apache.spark.sql.SparkSession

/** Perf surface: run every declared query at SPARK_GRAFT_SF_DIR, print ONE
  * JSON line with per-query wall seconds. A failing query is loudly
  * reported on stderr (name + exception) and contributes -1.0 — never a
  * silent near-zero that reads as "fast".
  *
  * Each query is timed as the MEDIAN of `SPARK_GRAFT_REPS` runs
  * (default 3): single-shot full-bench numbers at sf0.1 showed ±6×
  * position/GC noise on unchanged plans (round-7 x4/x5), which medians
  * kill. The total is the sum of medians.
  *
  * If BASELINE_local.json exists (recorded DuckDB per-query wall times at
  * the same sf — scripts/baseline.py), the line also carries per-query
  * spark/duckdb ratios and their geometric mean (`vs_baseline_geomean`),
  * making the "within 2x of the local single-node baseline" target
  * mechanically checkable.
  */
object Bench {

  /** Execute a declared query FULLY and return its row count — the one
    * timed action both Bench and BenchOne use.
    *
    * NOT `df.count()`: count() re-optimizes the plan under an
    * Aggregate[count(1)], and Catalyst then legitimately deletes every
    * subtree that cannot change the row count — all pure projections
    * (the x-family's geometry math vanished: x9's count-plan was a bare
    * parquet scan), final sorts, and even whole join pipelines (em2's
    * unique-key left join eliminated its ENTIRE blocked-pair subtree:
    * 0.14 s at sf100 while em1's identical pair work took 150 s).
    * Meanwhile the DuckDB baseline (scripts/baseline.py) materializes
    * every query with CREATE TEMP TABLE AS — full compute, all columns.
    * Timing count() against that is not a comparison.
    *
    * `queryExecution.toRdd.count()` runs the query's OWN optimized plan
    * — every output column computed into UnsafeRows, joins and sorts
    * executed — and counts rows executor-side with no driver transfer
    * and no second Catalyst pass that could prune work. Discovered and
    * fixed in round 17; bench records from earlier rounds under-measure
    * projection-only and top-level-join queries.
    */
  def runFull(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** Generic Spark-machinery warmup: parquet write+read roundtrip under
    * java.io.tmpdir, a hash aggregate, a sort, a persist cycle — all on
    * `spark.range` data. Exercises the one-time costs (parquet
    * reader/writer init, janino codegen of the first real plan shapes,
    * block-manager persist paths) that otherwise land on whichever
    * timed line runs first in a fresh JVM. Touches NO testdata and
    * computes NO declared query, so it cannot pre-compute or cache any
    * benched result — it is the same class of warmup as the existing
    * range-sum line, just covering more of the machinery.
    */
  def machineryWarmup(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_warm").toFile
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete()
    }
    try {
      val p = s"${dir.getAbsolutePath}/w.parquet"
      spark.range(0, 10000)
        .selectExpr("id", "cast(id % 97 as double) as v",
          "array(cast(id as float), cast(id + 1 as float)) as vec")
        .write.mode("overwrite").parquet(p)
      val r = spark.read.parquet(p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.orderBy("id").limit(5).collect()
      r.groupBy(expr("id % 7")).agg(sum("v"), count("*")).collect()
      r.unpersist(false)
    } finally rmTree(dir)
  }

  /** Inter-query disk barrier: wait (GC-assisted) until the spill
    * filesystem has at least `minFreeBytes` usable before starting the
    * next query. At sf100 a heavy query's spill tail (x11_center_crop:
    * ~80 GB written) is reclaimed ASYNCHRONOUSLY — ContextCleaner deletes
    * shuffle files only after the stage's references are GC'd, and the
    * OS unlink of tens of GB takes real seconds — so the NEXT query can
    * ENOSPC in its predecessor's shadow (x12/x13 died this way in BOTH
    * round-18 sweeps while passing isolated). The barrier costs nothing
    * when disk is already free (one statfs) and replaces an hour-long
    * sweep loss with a bounded wait.
    *
    * The threshold self-limits to 80% of the free space observed at
    * session start: on a box whose steady-state free is BELOW the
    * requested floor, an unattainable threshold would otherwise stall
    * every line for the full timeout.
    */
  def diskBarrier(minFreeBytes: Long, startupFreeBytes: Long,
      timeoutSec: Int = 300): Unit = {
    if (minFreeBytes <= 0) return
    // Spark spills under spark.local.dir, which defaults to java.io.tmpdir
    val tmp = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val floor = minFreeBytes.min((startupFreeBytes * 0.8).toLong)
    if (tmp.getUsableSpace >= floor) return
    val t0 = System.nanoTime()
    System.err.println(f"[bench] disk barrier: ${tmp.getUsableSpace / 1e9}%.1f GB free < ${floor / 1e9}%.1f GB floor — GC + wait")
    while (tmp.getUsableSpace < floor &&
        (System.nanoTime() - t0) < timeoutSec * 1e9) {
      // GC promotes ContextCleaner's weak-ref processing, which is what
      // actually unlinks dead shuffle/spill files
      System.gc()
      Thread.sleep(2000)
    }
    // a timeout is NOT a release: the sweep proceeds into likely-ENOSPC
    // territory, and the log must say so (a "released" line here made
    // reclaimed-vs-timed-out indistinguishable in sweep forensics)
    if (tmp.getUsableSpace < floor)
      System.err.println(f"[bench] disk barrier TIMED OUT after ${(System.nanoTime() - t0) / 1e9}%.0f s (${tmp.getUsableSpace / 1e9}%.1f GB free < ${floor / 1e9}%.1f GB floor) — proceeding anyway")
    else
      System.err.println(f"[bench] disk barrier released after ${(System.nanoTime() - t0) / 1e9}%.0f s (${tmp.getUsableSpace / 1e9}%.1f GB free)")
  }

  /** Median of wall times — the one definition both Bench and BenchOne
    * report, so the dev tool can't disagree with the published line.
    */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Total bytes of the sf dir's `*.parquet` tables — the one corpus
    * probe both Bench and BenchOne size their session from. A table may
    * be a parquet DIRECTORY of part files (standard Spark output
    * layout): directories are summed recursively, because a dir's own
    * entry length (~4 KB) would silently flip a large corpus into the
    * tiny-session config (AQE off, 4 shuffle partitions).
    */
  def corpusBytes(sfDir: String): Long = {
    def sz(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).map(_.map(sz).sum).getOrElse(0L)
    Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.getName.endsWith(".parquet")).map(sz).sum)
      .getOrElse(Long.MaxValue)
  }

  /** Largest single parquet part file under the sf dir — the quantity
    * scan-split sizing must track (splits come from files, so the widest
    * file bounds scan parallelism).
    */
  def corpusMaxFileBytes(sfDir: String): Long = {
    def mx(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).map(_.foldLeft(0L)((a, c) => a.max(mx(c))))
        .getOrElse(0L)
    Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.getName.endsWith(".parquet")).foldLeft(0L)(
        (a, c) => a.max(mx(c))))
      .getOrElse(0L)
  }

  /** Size scan splits to the corpus: ~4 waves of `cpus` tasks over the
    * LARGEST file, clamped to [16 MB, 128 MB (the Spark default)].
    *
    * Why not a constant: 16 MB is right for a ~100 MB-per-table point
    * (the sf1 shape — 128 MB default would scan single-file tables on
    * ~1 core), but at a 13.7 GB table it makes ~860 tasks whose per-task
    * fixed cost (file open + footer/row-group metadata decode, which
    * GROWS with the file's row-group count) dominates: measured at the
    * sf100 point, the whole scan-bound query family ran ~3-5x slower
    * under 16 MB than 128 MB (x9 3.40 s -> 1.01 s, a1 2.92 s -> 0.59 s,
    * identical plans), surfacing as a uniform alpha~1.6 cluster on the
    * sf30->sf100 trend step while DuckDB scaled linearly. The clamp
    * keeps every <=sf10 point at exactly the old 16 MB (committed
    * records stay comparable) and converges to the Spark default at
    * scale. Env override: SPARK_GRAFT_MAX_PARTITION_BYTES.
    */
  def sizedMaxPartitionBytes(sfDir: String, cpus: Int): Long =
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES").map(_.toLong).getOrElse(
      (corpusMaxFileBytes(sfDir) / (4L * cpus.max(1)))
        .max(16L << 20).min(128L << 20))

  /** Size the shuffle width to the corpus: `cpus` partitions up to a
    * ~64 MB-per-partition corpus, then grow with the data, capped at
    * 8x cores. Same lesson as sizedMaxPartitionBytes but for the
    * exchange side: at a fixed 32 partitions the sf100 point puts
    * ~19M rows through each sort task of a big window/join exchange,
    * crossing the in-memory sort threshold — measured x17 112 s at 32
    * partitions vs 67 s at 128 (same plan; the extra partitions just
    * keep per-task sort volume inside memory). AQE (on at every >64 MB
    * point) coalesces the width back down for the exchanges that ARE
    * small, so modest queries do not pay 8x scheduling. On a real
    * cluster this knob is executor count; on one box it is the only
    * lever against per-task volume growing linearly with the corpus.
    */
  def sizedShufflePartitions(sfDir: String, cpus: Int): Int = {
    val c = cpus.max(1)
    // clamp in Long BEFORE narrowing: corpusBytes returns Long.MaxValue
    // for a missing/unlistable sfDir, and a Long->Int truncation of that
    // (or of any >2^31 partition count) is sign-garbage; the old
    // `.toInt.max(c)` only masked it by evaluation order
    ((corpusBytes(sfDir) / (64L << 20)).min(8L * c).max(c.toLong)).toInt
  }

  /** Baseline "queries" map, if the file exists for this sf. The file
    * defaults to BASELINE_local.json (sf0.1, the driver's round loop) and
    * is overridable via SPARK_GRAFT_BASELINE for builder-owned scale
    * points (e.g. BASELINE_sf1.json over scratch/sf1).
    */
  def loadBaseline(sfDir: String): Map[String, Double] = {
    val f = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE_local.json"))
    if (!f.exists) return Map.empty
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(f)
      val baseSf = root.path("sf_dir").asText("")
      if (baseSf != sfDir) {
        // loud, not silent: an existing baseline whose sf_dir merely
        // differs in spelling (relative vs absolute) would otherwise just
        // drop the ratio fields and read as "no baseline recorded"
        System.err.println(
          s"[bench] baseline ${f.getPath} exists but its sf_dir ('$baseSf') " +
            s"!= SPARK_GRAFT_SF_DIR ('$sfDir') — ratios omitted")
        return Map.empty
      }
      val it = root.path("queries").properties().iterator()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> e.getValue.asDouble()
      }
      b.result()
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Size the session to the corpus — same spirit as DuckDB choosing
    // parallelism from table size:
    //  - AQE pays a fixed per-stage replan round trip, worth it exactly
    //    when there is data to re-plan over (runtime coalescing, skew
    //    splitting). Below 64 MB the static plan is already right and the
    //    latency is pure floor on sub-second queries → disabled.
    //  - 32 shuffle partitions on a KB-scale shuffle is 32 tiny tasks of
    //    pure scheduling; a tiny corpus gets 4 (still parallel for the
    //    MB-scale shuffles it can produce). At/above 64 MB both revert to
    //    the scale shape (AQE on, partitions = cores), measured unchanged
    //    at the committed sf1/sf3/sf10 points.
    val tiny = corpusBytes(sfDir) < (64L << 20)
    // dev knob for floor experiments; default = the size-aware choice
    // (tiny -> 4; scale -> corpus-sized width, see sizedShufflePartitions)
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      if (tiny) "4"
      else String.valueOf(sizedShufflePartitions(sfDir, cpus.toInt)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.adaptive.enabled", String.valueOf(!tiny))
      // sf10-class runs saturate all cores for minutes; the default 120 s
      // heartbeat window logged spurious RPC timeout warnings there
      .config("spark.network.timeout", "600s")
      // corpus-sized scan splits (sizedMaxPartitionBytes): small points
      // need sub-default splits for parallelism, huge single files need
      // bigger splits or per-task footer decode dominates — rationale on
      // the method.
      .config("spark.sql.files.maxPartitionBytes",
        String.valueOf(sizedMaxPartitionBytes(sfDir, cpus.toInt)))
      // same pin as Verify: declared time queries are zone-independent by
      // construction (ops/Tables.scala normalizes ts to epoch-nanos), but
      // the harness states the precondition rather than assuming it
      .config("spark.sql.session.timeZone", "UTC")
      // precondition of graft.ops.Tables (asserted there, set here)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // shuffle codec, parameterised (guide §2.3 "measure both"): local
      // default stays lz4 (Spark's default — keeps the driver's bench
      // comparable across rounds; measured wall delta on local[32] is
      // within box noise in both directions). zstd shuffles 1.35x fewer
      // bytes on the declared row shapes (260.4 -> 192.5 MB on a 6M-row
      // wide sort, scratch/codec_bytes.scala) — at real NIC-bound scale
      // set SPARK_GRAFT_IO_CODEC=zstd so the exchange moves 26% less.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen so the alphabetically-first query doesn't absorb
    // several seconds of one-time startup in its reported time
    spark.range(1000).selectExpr("sum(id)").collect()
    // ...and the heavier machinery (parquet reader/writer init, janino
    // codegen of real plan shapes, persist paths) that the range-sum
    // does not touch. Measured attribution (scratch/profidx_*.log, r22):
    // sim3_index_build — the first timed line of every session — read
    // 3.8 s cold of which ~2.1 s was this one-time warmup; with the
    // machinery warmed it reads ~1.7 s (warm rebuilds ~0.8 s either
    // way). The warmup runs on spark.range data only (no testdata, no
    // declared query), so nothing benched is precomputed or cached.
    machineryWarmup(spark)
    var failed = List.empty[String]
    // Index BUILD timed as its own line: a real system separates the
    // one-off IVF index build from the queries it serves. sim3's
    // kmeansIndex is memoized per corpus, so pre-warming it here (with
    // sim3's exact parameters) makes the sim3 line below measure the
    // probe path only, and `sim3_index_build` carries the Lloyd passes.
    val idx0 = System.nanoTime()
    val idxOk =
      try {
        // same definition site as the sim3 query body — cannot drift
        graft.queries.SimQueries.sim3Index(spark, sfDir)
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] sim3_index_build FAILED: ${e.getClass.getName}: ${e.getMessage}")
          failed ::= "sim3_index_build"
          false
      }
    val idxLine = "sim3_index_build" ->
      (if (idxOk) (System.nanoTime() - idx0) / 1e9 else -1.0)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // Same scale-point knob as graft.Verify: a query whose single-node
    // shuffle footprint exceeds the box at a huge mult is left out of the
    // sweep; the JSON records the omission in "skipped_queries" so a
    // bench line can never silently pass itself off as full-surface.
    val skipQ = sys.env.getOrElse("SPARK_GRAFT_SKIP_QUERIES", "")
      .split(",").filter(_.nonEmpty).toSet
    skipQ.foreach(n => System.err.println(
      s"[bench] $n SKIPPED (SPARK_GRAFT_SKIP_QUERIES)"))
    // Bucketed-layout ingest timed as its own line, same rationale as
    // sim3_index_build: a real system pays the layout ONCE at ingest and
    // every a2_bucketed/j2_bucketed run reuses it. The layout is
    // memoized ON DISK (Tables.bucketed re-registers existing files), so
    // this line measures a write only on the first-ever sweep at a scale
    // point and a catalog lookup afterwards. Skipped when both bucketed
    // queries are skipped.
    val bkt0 = System.nanoTime()
    // layout-granular gating (r20 ADVICE): ingest only layouts whose
    // consumer queries survive the skip filter — a disk-constrained
    // sweep skipping a2_bucketed must not still write lineitem's copy
    val bktNeeded = graft.ops.Tables.layoutConsumers.values
      .exists(_.exists(q => !skipQ(q)))
    var bktCold = false
    val bktOk =
      if (!bktNeeded) false
      else try {
        bktCold = graft.ops.Tables.ingestDeclaredLayouts(spark, sfDir, skipQ)
        // Read every ingested layout through ONCE inside this timed line:
        // first-access I/O (OS page cache cold on a freshly written or
        // freshly booted layout) belongs to ingest, not to whichever
        // bucketed query happens to run first in the sweep. Without this
        // the r21 driver's 32-core run charged a2/j2_bucketed 2.2 s for
        // the cold first read of files its own ingest had just written,
        // while its 8-core run minutes later read 0.33 s (r21 VERDICT
        // item 3). toRdd.count() materializes every column of every row
        // (same coverage as the noop sink, guide §1.4).
        graft.ops.Tables.declaredLayouts.foreach { case (name, _, _, _) =>
          if (graft.ops.Tables.layoutConsumers(name).exists(q => !skipQ(q)))
            runFull(graft.ops.Tables.bucketedDeclared(spark, sfDir, name))
        }
        true
      }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] bucketed_ingest FAILED: ${e.getClass.getName}: ${e.getMessage}")
          failed ::= "bucketed_ingest"
          false
      }
    // omitted (not -1.0) when both bucketed queries are skipped: an
    // intentionally-skipped ingest is not a failure
    val bktLine =
      if (!bktNeeded) Nil
      else Seq("bucketed_ingest" ->
        (if (bktOk) (System.nanoTime() - bkt0) / 1e9 else -1.0))
    // Inter-query disk barrier (see diskBarrier): default 24 GB floor at
    // scale points, off for the tiny driver corpus (sub-second queries
    // never spill GBs, and a GC-wait there would perturb floor timings).
    val minFreeBytes =
      (sys.env.get("SPARK_GRAFT_MIN_FREE_GB").map(_.toDouble)
        .getOrElse(if (tiny) 0.0 else 24.0) * (1L << 30)).toLong
    val startupFree = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp")).getUsableSpace
    val results = (SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot(q => skipQ(q._1)).map { case (name, fn) =>
      diskBarrier(minFreeBytes, startupFree)
      val walls = (1 to reps).flatMap { _ =>
        // release BEFORE timing, not after: each rep then measures the
        // full computation (CacheManager matches by logical plan, so
        // without this reps 2..n of a caching query would silently time
        // cache hits), and nothing accumulates across the 68-query sweep
        // (the w2/w9 persisted sort is a fresh RDD per invocation — at
        // sf10 leaving reps x queries of them resident is real memory)
        graft.ops.Caches.releaseAll(spark)
        val t0 = System.nanoTime()
        try { runFull(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            if (!failed.contains(name)) failed ::= name
            None
        }
      }
      name -> (if (walls.size == reps) median(walls) else -1.0)
    }) ++ bktLine :+ idxLine
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries failed: ${failed.sorted.mkString(",")}")
    val baseline = loadBaseline(sfDir)
    // Locale.ROOT: the f"" interpolator is default-locale-sensitive and a
    // comma-decimal locale would corrupt the JSON line
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    val ratios =
      if (baseline.isEmpty) Nil
      else results.collect {
        case (k, v) if v >= 0 && baseline.get(k).exists(_ > 0) =>
          (k, v, baseline(k))
      }
    val ratioPart =
      if (ratios.isEmpty) "" // no baseline, or every query failed
      else {
        val rs = ratios.map { case (k, v, b) =>
          "\"" + k + "\":" + num(v / b, 3) }.mkString("{", ",", "}")
        val geomean =
          math.exp(ratios.map(r => math.log(r._2 / r._3)).sum / ratios.size)
        // total-vs-total is the headline comparison: per-query ratios on
        // sub-10ms DuckDB queries mostly measure Spark's fixed per-job
        // floor (~0.2 s scheduling + footer reads), which amortizes away
        // at scale; the total ratio amortizes it here too
        val totalSpark = ratios.map(_._2).sum
        val totalBase = ratios.map(_._3).sum
        // floor-dominated bucket: queries whose ORACLE is <0.1 s measure
        // Spark's fixed per-job floor, not the operator — splitting them
        // out stops round-over-round diffs flagging job-floor noise as
        // regressions while keeping the headline total honest
        val (real, floor) = ratios.partition(_._3 >= 0.1)
        def bucket(tag: String, rs2: Seq[(String, Double, Double)]) =
          if (rs2.isEmpty) ""
          else {
            val ts = rs2.map(_._2).sum; val tb = rs2.map(_._3).sum
            s""","$tag":{"n":${rs2.size},"spark_sec":${num(ts, 2)}""" +
              s""","duckdb_sec":${num(tb, 2)},"ratio":${num(ts / tb, 3)}}"""
          }
        s""","baseline_sec":${num(baseline.values.sum, 2)}""" +
          s""","vs_baseline_total":${num(totalSpark / totalBase, 3)}""" +
          bucket("real_work", real) + bucket("floor_dominated", floor) +
          s""","vs_baseline":$rs""" +
          s""","vs_baseline_geomean":${num(geomean, 3)}"""
      }
    val skipPart =
      if (skipQ.isEmpty) ""
      else skipQ.toSeq.sorted.map("\"" + _ + "\"")
        .mkString(""","skipped_queries":[""", ",", "]")
    // whether the bucketed_ingest line measured a COLD write (first-ever
    // sweep at this scale point) or an on-disk re-register (~100x
    // cheaper) — without the flag, totals were not comparable
    // round-over-round (r20 ADVICE). null when the ingest FAILED: a
    // failed ingest is neither cold nor warm, and `false` there made a
    // failure indistinguishable from a successful re-register (r21
    // ADVICE)
    val bktPart =
      if (!bktNeeded) ""
      else if (!bktOk) ""","bucketed_ingest_cold":null"""
      else s""","bucketed_ingest_cold":$bktCold"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"sf":"$sfDir"$skipPart$bktPart$ratioPart}"""
    println(line)
    // Also persist the line whole: the driver's round artifact captures
    // only the sbt output tail, which truncates the per-query map on big
    // query counts (BENCH_r13/r14 committed with "parsed": null). A file
    // copy can always be read in full. Best-effort — a read-only CWD must
    // not fail the bench itself.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "scratch/bench_last.json")
    try {
      val f = new java.io.File(outPath)
      Option(f.getParentFile).foreach(_.mkdirs())
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(line) finally w.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write $outPath: $e")
    }
    spark.stop()
    // Round-artifact hygiene, wired into the bench itself (not a separate
    // step someone must remember): the driver's round order is verify →
    // bench → judge, so by now this round's CORRECTNESS_r{N}.json exists
    // untracked; roundend.sh commits it (plus LEAKCHECK and the full
    // bench JSON as BENCH_full_r{N}.json) before the judge reads the
    // tree. Best-effort — a missing script/git must never fail a bench,
    // and a HUNG git (stale index.lock, credential prompt) must not wedge
    // the driver either: output goes to a file (no unbounded pipe read)
    // and the child is force-killed after 60 s.
    try {
      val script = new java.io.File("scripts/roundend.sh")
      if (script.isFile) {
        val logF = new java.io.File("scratch/roundend_last.log")
        Option(logF.getParentFile).foreach(_.mkdirs())
        val p = new ProcessBuilder("bash", script.getPath)
          .redirectErrorStream(true)
          .redirectOutput(logF)
          .start()
        val done = p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
        if (!done) {
          p.destroyForcibly()
          System.err.println("[bench] roundend.sh timed out after 60s (killed)")
        } else {
          val out = new String(
            java.nio.file.Files.readAllBytes(logF.toPath), "UTF-8")
          System.err.println(s"[bench] roundend.sh: ${out.trim}")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] roundend.sh failed (ignored): $e")
    }
    // The driver writes BENCH_r{N}.json + the LEAKCHECK round bump AFTER
    // this process exits, so the synchronous roundend.sh above can never
    // commit THEM (judge-flagged three rounds running). Spawn a detached
    // watcher (setsid survives sbt's exit) that commits them the moment
    // they appear — see scripts/artifactwatch.sh. Best-effort.
    //
    // Spawn ONLY for the driver's round corpus (sf0.1) — a dev run at a
    // scratch scale point must not leave a 15-minute background
    // auto-committer racing interactive work (git adds mid-edit). A dev
    // run that WANTS the watcher can force it with
    // SPARK_GRAFT_ROUND_WATCH=1.
    val watchWanted = sys.env.get("SPARK_GRAFT_ROUND_WATCH") match {
      case Some(v) => v == "1"
      case None    => sfDir.contains("sf0.1")
    }
    try {
      val watch = new java.io.File("scripts/artifactwatch.sh")
      if (!watchWanted)
        System.err.println("[bench] artifactwatch not spawned (dev corpus; " +
          "SPARK_GRAFT_ROUND_WATCH=1 forces it)")
      else if (watch.isFile) {
        val logF = new java.io.File("scratch/artifactwatch.log")
        Option(logF.getParentFile).foreach(_.mkdirs())
        new ProcessBuilder("setsid", "bash", watch.getPath)
          .redirectErrorStream(true)
          .redirectOutput(java.lang.ProcessBuilder.Redirect.appendTo(logF))
          .start() // deliberately not waited on
        System.err.println("[bench] artifactwatch.sh spawned (detached)")
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] artifactwatch spawn failed (ignored): $e")
    }
    // LAST stdout line, deliberately short: the driver's round capture
    // keeps only the TAIL of stdout, which on big query counts truncates
    // the full JSON line above from the FRONT — exactly where its
    // headline "value" sits (BENCH_r13/14/16 committed "parsed": null).
    // A compact trailing summary survives any tail truncation, so the
    // driver's own capture is self-sufficient even without
    // BENCH_full_r{N}.json.
    val vsTotal =
      if (ratios.isEmpty) ""
      else s""","vs_baseline_total":${num(
        ratios.map(_._2).sum / ratios.map(_._3).sum, 3)}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"$vsTotal,"full":"$outPath"}""")
  }
}
