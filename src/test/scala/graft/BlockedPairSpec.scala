package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The em1 hot-block guard: triangle-decomposed blocked all-pairs must be
  * row-identical to the naive per-label self-join while bounding the pair
  * count any single task key sees — exercised on a 90%-hot-label skew.
  */
class BlockedPairSpec extends SparkSpec {

  /** Deterministic pseudo-random embeddings, 90% in one hot label. */
  private def skewed(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val label = if (i < (n * 9) / 10) "hot" else s"cold${i % 3}"
      val vec = Array.tabulate(dim)(j =>
        (math.sin(i * 37.0 + j * 13.0) * 100).toFloat)
      (i.toLong, label, vec)
    }.toDF("vec_id", "label", "embedding")
  }

  test("triangle decomposition is row-identical to the naive self-join") {
    val df = skewed(200, 8)
    val maxBlock = 20 // hot block = 180 rows -> m = 9 buckets
    val got = Similarity.blockedClosestPair(
      df, "label", "vec_id", "embedding", maxBlock)
      .orderBy("label").collect().map(_.toSeq)

    // naive reference: plain self-join + per-label window (the old plan)
    graft.expr.GraftFunctions.register(spark)
    val emb = df.select(col("label"), col("vec_id"), col("embedding"),
      Similarity.l2norm(col("embedding")).as("nrm"))
    val a = emb.select(col("label"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = emb.select(col("label").as("lb"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos").desc, col("va"), col("vb"))
    val want = a.join(b, col("label") === col("lb") && col("va") < col("vb"))
      .select(col("label"), col("va"), col("vb"),
        round(Similarity.dotFast(col("ea"), col("eb")) /
          (col("na") * col("nb")), 6).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("label", "va", "vb", "cos")
      .orderBy("label").collect().map(_.toSeq)

    assert(got.toSeq == want.toSeq)
  }

  test("no task key sees a quadratic hot-block slice; no pair lost or duplicated") {
    val n = 200; val maxBlock = 20
    val df = skewed(n, 8)
    val pairs = Similarity.blockedPairs(
      df, "label", "vec_id", "embedding", maxBlock)

    // every unordered pair exactly once per label
    val perLabel = pairs.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = df.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lbl, cnt) =>
      assert(perLabel.getOrElse(lbl, 0L) == cnt * (cnt - 1) / 2,
        s"$lbl: ${perLabel.get(lbl)} pairs for $cnt rows")
    }
    assert(pairs.groupBy("label", "va", "vb").count()
      .filter(col("count") > 1).count() == 0, "duplicated pairs")

    // the guard: per-(label,p,q) task-key pair count stays ~maxBlock^2
    // even though the hot label holds 180 of 200 rows
    val maxTask = pairs.groupBy("label", "p", "q").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxTask <= 4L * maxBlock * maxBlock,
      s"task key saw $maxTask pairs (cap ${4 * maxBlock * maxBlock})")
    // and the hot label actually decomposed (m = ceil(180/20) = 9 buckets)
    val hotTasks = pairs.filter(col("label") === "hot")
      .select("p", "q").distinct().count()
    assert(hotTasks == 9L * 10 / 2, s"expected 45 hot bucket pairs, $hotTasks")
  }

  test("em2 canonical dedup: min-id neighbor above threshold, self otherwise") {
    import spark.implicits._
    // two planted dup clusters in one label + a singleton + an unrelated
    // label; base vectors near-orthogonal so cross-cluster cos << tau
    def v(seed: Int) = Array.tabulate(16) { j =>
      if (j == seed % 16) 10f else (math.sin(seed * 91.0 + j) * 0.1).toFloat
    }
    val rows = Seq(
      (10L, "a", v(0)), (11L, "a", v(0)), (12L, "a", v(0)), // cluster -> 10
      (20L, "a", v(5)), (21L, "a", v(5)), //                   cluster -> 20
      (30L, "a", v(9)), //                                     singleton
      (40L, "b", v(0)) //                  same vec, other block: NOT a dup
    ).toDF("vec_id", "label", "embedding")
    val canon = Similarity.blockedPairs(
        rows, "label", "vec_id", "embedding", maxBlock = 2)
      .filter(col("cos") >= 0.9)
      .groupBy(col("vb").as("vec_id")).agg(min(col("va")).as("canon"))
    val got = rows.select(col("vec_id"), col("label"))
      .join(canon, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("canon"), col("vec_id")).as("canonical_id"))
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 40L -> 40L))
  }
}
