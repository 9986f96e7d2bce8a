package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the em3 tuning record (round 18):
  *
  *   runMain graft.Em3Sweep cells          — per-(label, probed-cell)
  *     population histogram + the candidate-pair work Σ C(n,2) implied
  *     by each nProbe in {2,3,4}, straight from group counts (no pair
  *     join runs — counts alone determine the generated-candidate work).
  *
  *   runMain graft.Em3Sweep split          — candidate-pair work with the
  *     hot-cell sub-split applied, per (nProbe, cap) — counts only, no
  *     pair join (the cap-picking companion to `cells`).
  *
  *   runMain graft.Em3Sweep agree 2 3 4    — em3-vs-em1 exact-pair
  *     agreement (and cosine shortfall on disagreement) at each probe
  *     width, computed in one session against em1's exact result —
  *     the in-memory form of scripts/em_agreement.py, so a probe sweep
  *     does not need one Verify dump per configuration.
  *
  * Corpus from SPARK_GRAFT_SF_DIR. Dev tooling only — not part of the
  * declared query surface.
  */
object Em3Sweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tiny = Bench.corpusBytes(sfDir) < (64L << 20)
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      if (tiny) "4"
      else String.valueOf(Bench.sizedShufflePartitions(sfDir, cpus.toInt)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.adaptive.enabled", String.valueOf(!tiny))
      .config("spark.sql.files.maxPartitionBytes",
        String.valueOf(Bench.sizedMaxPartitionBytes(sfDir, cpus.toInt)))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Similarity => S, Tables => T}
    val emb = T.embeddings(spark, sfDir)
    val cents = graft.queries.SimQueries.sim3Index(spark, sfDir)

    args.headOption.getOrElse("cells") match {
      case "cells" =>
        // counts per (label, rank-k cell) for the widest probe, then the
        // implied candidate work per nProbe from the same aggregation
        val ranked = S.centroidRanks(emb, "embedding", "vec_id", cents, 4)
          .select(col("label"), col("c_label").as("cell"), col("rk"))
        ranked.cache()
        Seq(2, 3, 4).foreach { np =>
          val g = ranked.filter(col("rk") <= np)
            .groupBy("label", "cell").agg(count(lit(1)).as("n"))
          val work = g.agg(sum(col("n") * (col("n") - 1) / 2)).head.getAs[Any](0)
          println(s"[em3-sweep] nProbe=$np candidate work sum(C(n,2)) = $work")
        }
        println("[em3-sweep] top (label, cell) blocks at nProbe=2:")
        ranked.filter(col("rk") <= 2)
          .groupBy("label", "cell").agg(count(lit(1)).as("n"))
          .orderBy(desc("n")).limit(25).collect()
          .foreach(r => println(s"  label=${r.get(0)} cell=${r.get(1)} n=${r.get(2)}"))
        ranked.unpersist()

      case "split" =>
        // candidate-pair work with the hot-cell sub-split applied, for
        // each (nProbe, cap): blocks over cap re-key by the vector's two
        // NEXT centroid ranks (np+1, np+2 — "cross-split probe"), so a
        // hot block of n rows becomes ~2n rows spread over the remaining
        // cells. Work = sum C(n,2) over the refined keys — counts alone,
        // no pair join.
        val maxRk = 6 // widest nProbe (4) + 2 sub-ranks
        val ranked = S.centroidRanks(emb, "embedding", "vec_id", cents, maxRk)
          .select(col("vec_id"), col("label"), col("c_label"), col("rk"))
        ranked.cache(); ranked.count()
        Seq(2, 3).foreach { np =>
          val probed = ranked.filter(col("rk") <= np)
            .select(col("vec_id"), col("label"), col("c_label").as("cell"))
          val subs = ranked.filter(col("rk") > np && col("rk") <= np + 2)
            .select(col("vec_id"), col("c_label").as("sub"))
          val cnt = probed.groupBy("label", "cell").agg(count(lit(1)).as("n"))
          Seq(1024, 4096, 8192, 16384).foreach { cap =>
            val cool = cnt.filter(col("n") <= cap)
              .agg(coalesce(sum(col("n") * (col("n") - 1) / 2), lit(0.0)))
              .head.getDouble(0)
            val hot = probed
              .join(broadcast(cnt.filter(col("n") > cap).select("label", "cell")),
                Seq("label", "cell"))
              .join(subs, Seq("vec_id"))
              .groupBy("label", "cell", "sub").agg(count(lit(1)).as("m"))
              .agg(coalesce(sum(col("m") * (col("m") - 1) / 2), lit(0.0)))
              .head.getDouble(0)
            println(f"[em3-sweep] nProbe=$np cap=$cap%5d work=${cool + hot}%.3e " +
              f"(cool=$cool%.2e hot-split=$hot%.2e)")
          }
        }
        ranked.unpersist()

      case "agree" =>
        // args: agree [np[:cap]]... e.g. `agree 2 3 3:128` — cap defaults
        // to off so plain widths measure the pure probe effect
        val probes = args.drop(1).toSeq match {
          case Nil => Seq((2, Int.MaxValue), (3, Int.MaxValue), (4, Int.MaxValue))
          case s => s.map { a =>
            a.split(":") match {
              case Array(np) => (np.toInt, Int.MaxValue)
              case Array(np, cap) => (np.toInt, cap.toInt)
            }
          }
        }
        val t0 = System.nanoTime()
        val em1 = S.blockedClosestPair(emb, "label", "vec_id", "embedding",
          maxBlock = 4096)
          .select(col("label"), col("va").as("e_va"), col("vb").as("e_vb"),
            col("cos").as("e_cos"))
        em1.cache()
        val nLab = em1.count()
        println(f"[em3-sweep] em1 exact: $nLab labels in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        probes.foreach { case (np, cap) =>
          val t1 = System.nanoTime()
          val em3 = S.ivfClosestPair(emb, "label", "vec_id", "embedding",
            cents, nProbe = np, maxBlock = 4096, hotCellCap = cap)
          val j = em1.join(em3, Seq("label"), "left")
            .select(col("label"),
              // coalesce: on a dropped label va is NULL, and NULL && x
              // stays NULL — getBoolean below would NPE on exactly the
              // dropped>0 case this harness exists to measure
              coalesce(col("va") === col("e_va") && col("vb") === col("e_vb"),
                lit(false)).as("exact"),
              col("va").isNull.as("dropped"),
              (col("e_cos") - coalesce(col("cos"), lit(0.0))).as("shortfall"))
            .collect()
          val dt = (System.nanoTime() - t1) / 1e9
          val agree = j.count(_.getBoolean(1))
          val dropped = j.count(_.getBoolean(2))
          val miss = j.filter(r => !r.getBoolean(1))
          val meanSf = if (miss.isEmpty) 0.0
            else miss.map(_.getDouble(3)).sum / miss.length
          val maxSf = if (miss.isEmpty) 0.0 else miss.map(_.getDouble(3)).max
          val capS = if (cap == Int.MaxValue) "off" else cap.toString
          println(f"[em3-sweep] nProbe=$np cap=$capS%s agreement=$agree/$nLab dropped=$dropped " +
            f"shortfall mean=$meanSf%.4f max=$maxSf%.4f elapsed=$dt%.1f s")
        }
        em1.unpersist()

      case other => sys.error(s"unknown mode $other (cells|split|agree)")
    }
    spark.stop()
  }
}
