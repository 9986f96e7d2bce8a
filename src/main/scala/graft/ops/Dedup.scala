package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for a large-scale training-data pipeline: exact
  * (hash-groupBy) and near-dup (MinHash + banded LSH). Both are
  * shuffle-on-key shapes — no all-pairs comparison anywhere, which is the
  * property that keeps them viable at 100 TB.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id
    * (deterministic "first"), report group size. Output:
    * (content_hash, keep_id, dup_count). One shuffle on the hash; at
    * scale the md5 is computed map-side and the groupBy partial-aggregates.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(md5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("dup_count"))

  /** Near-duplicate candidate pairs via banded MinHash LSH:
    * lowercase tokens → word k-shingles → `numHashes` MinHash values →
    * `bands` band keys (rowsPerBand = numHashes / bands) → self-join on
    * (band, key) → distinct (a < b) pairs.
    *
    * Candidate generation is a bucket join on the band key — candidate
    * pairs ≪ n² by construction (asserted in the test suite). Docs with
    * fewer than k tokens produce no shingles and are excluded, mirroring
    * the guarded `TextOps.shingles`.
    *
    * Runs at SIGNATURE level (the t11 fingerprint-level insight): the
    * banding output for a doc is a pure function of its MinHash
    * signature, so docs are grouped by the 8-long signature itself and
    * the band self-join runs once per DISTINCT signature. Same-signature
    * docs agree on every band (intra pairs, always emitted — exactly
    * what the doc-level join produced for them), and a cross-signature
    * doc pair collides iff its two representative signatures collide
    * (inter pairs, recovered by [[expandSetPairs]]). A dup-heavy corpus
    * concentrates docs onto few distinct signatures, so the join and
    * its distinct run at distinct-signature cardinality; the worst case
    * (every signature unique) degenerates to the doc-level plan plus
    * one fixed-width groupBy and two id joins.
    */
  /** Test seam: counts rep-level path selections (adaptive decision
    * observability — see the adaptive note in [[nearDupCandidates]]).
    */
  private[graft] val repPathCount =
    new java.util.concurrent.atomic.AtomicLong

  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.expr.GraftFunctions.register(docs.sparkSession)
    // one scan pass: tokens → shingles → signature; nothing wider than
    // (id, 8 longs) survives past the scan
    val keyed = Caches.cached(docs
      .select(col(idCol), TextOps.tokensLower(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= k)
      .select(col(idCol), TextOps.minhashSignatureFast(
        TextOps.shinglesFast(col("tk"), k), numHashes).as("sg")))
    // ADAPTIVE path choice (a cost-based decision, like AQE's): the
    // signature-level rewrite only pays when signatures actually repeat.
    // One cheap aggregate over the cached scan estimates the distinct-
    // signature fraction; on the adversarial all-unique corpus
    // (scripts/datagen_lowdup.py — measured 8.9 s vs the dup-heavy
    // shape's 5.4 s at 1.5M docs, a 1.64x penalty that was pure
    // groupReps overhead) the doc-level banding runs directly, while any
    // real dup-heavy crawl shape keeps the set-level plan. Both paths
    // are row-identical (pinned in OpsSpec), so the decision can depend
    // on data without affecting results. The 0.8 threshold is
    // deliberately coarse — with an explicit rsd of 2% (Spark's DEFAULT
    // relativeSD is 5%, too loose to honestly claim a margin) the
    // estimate cannot flip a corpus that is meaningfully on either side,
    // and near the boundary both plans cost about the same.
    val st = keyed.agg(count(lit(1)).as("n"),
      approx_count_distinct(xxhash64(col("sg")), 0.02).as("nd")).head()
    val (n, nd) = (st.getLong(0), st.getLong(1))
    if (nd > n * 0.8) {
      bandPairs(keyed, idCol, "sg", bands, numHashes / bands)
    } else {
      repPathCount.incrementAndGet()
      val (docMap, reps) = groupReps(keyed, idCol, "sg", Seq.empty)
      val setPairs = bandPairs(
        reps.select(col("rep").as(idCol), col("sg")), idCol, "sg",
        bands, numHashes / bands)
      expandSetPairs(docMap, idCol, setPairs
        .select(col("doc_a").as("rep_a"), col("doc_b").as("rep_b")),
        Seq.empty)
    }
  }

  /** Candidate generation from a precomputed shingle column — lets a
    * two-stage pipeline (candidates -> exact Jaccard) tokenize once.
    * min(md5) over a multiset equals min over its distinct set, so a
    * distinct shingle set produces identical candidates.
    */
  def nearDupCandidatesFromShingles(sh: DataFrame, idCol: String,
      shingleCol: String, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.expr.GraftFunctions.register(sh.sparkSession)
    val sig = sh.select(col(idCol),
      TextOps.minhashSignatureFast(col(shingleCol), numHashes).as("sg"))
    bandPairs(sig, idCol, "sg", bands, numHashes / bands)
  }

  /** The banded-LSH self-join on precomputed signatures: explode each
    * signature into its band keys, bucket-join on (band, key), keep
    * each unordered id pair once. Output: (doc_a, doc_b), doc_a < doc_b.
    */
  private def bandPairs(sig: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val bandRows = sig.select(col(idCol),
      posexplode(TextOps.bandKeys(col(sigCol), bands, rowsPerBand))
        .as(Seq("b", "bk")))
    val a = bandRows.select(col(idCol).as("doc_a"), col("b"), col("bk"))
    val b = bandRows.select(col(idCol).as("doc_b"), col("b"), col("bk"))
    // Both sides are the whole corpus's band rows — never broadcastable
    // at scale, so pin the bucket join to a shuffled hash join on
    // (b, bk): per-task build is corpus/numPartitions rows, and a hot
    // bucket contributes only its own rows to the build (the pair
    // blow-up happens streaming-side, row by row).
    a.join(b.hint("shuffle_hash"), Seq("b", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Collapses docs with an identical `keyCol` value to one
    * representative per value — the t11 fingerprint-level-LSH insight
    * applied to the MinHash pipeline. A dup-heavy corpus (the case
    * near-dup detection exists for) concentrates its docs onto few
    * distinct keys (signatures for candidates, exact shingle-hash sets
    * for Jaccard), so everything downstream of this groupBy — band
    * self-join, candidate distinct, per-pair exact Jaccard — runs at
    * distinct-key cardinality instead of doc cardinality. At the 100×
    * scale point that is ~5k sets for 500k docs: the candidate-pair
    * array shuffle drops from ~32M pairs × two ~45-long[] payloads
    * (~23 GB) to a few thousand, and the only remaining doc-volume
    * stages are the id-expansion hash joins whose output IS the answer.
    * Worst case (every key unique) degenerates to the doc-level plan
    * plus one fixed-width groupBy and two id joins — same shape.
    *
    * `carry` columns ride through the groupBy via first(col) — only
    * pass columns that are pure functions of `keyCol` (constant within
    * a group), which keeps first() deterministic.
    *
    * Returns (docMap, reps): docMap = (idCol, rep), one row per doc;
    * reps = (keyCol, rep, carry...), one row per distinct key. Both
    * cached — docMap feeds the intra self-join and both expansion
    * joins, reps feeds the banding and (for Jaccard) both verify
    * joins. The doc→rep mapping is derived by joining the keyed scan
    * back to the per-key min — NOT a collect_list per group, which a
    * viral boilerplate doc (1e9 copies at 100 TB) would turn into a
    * single-row OOM. The join is left unhinted: under AQE its runtime
    * size decides broadcast vs shuffle — reps is broadcast-small
    * exactly when the corpus is dup-heavy, and corpus-sized (shuffle)
    * in the degenerate all-unique case.
    */
  private def groupReps(keyed: DataFrame, idCol: String, keyCol: String,
      carry: Seq[String]): (DataFrame, DataFrame) = {
    val reps = Caches.cached(keyed.groupBy(keyCol)
      .agg(min(col(idCol)).as("rep"),
        carry.map(c => first(col(c)).as(c)): _*))
    val docMap = Caches.cached(keyed.select(col(idCol), col(keyCol))
      .join(reps.select(keyCol, "rep"), keyCol)
      .select(col(idCol), col("rep")))
    (docMap, reps)
  }

  /** Expands set-level pairs (rep_a, rep_b, payload...) back to doc
    * pairs. Intra-set pairs (same distinct shingle set) get
    * `intraPayload` — e.g. Jaccard 1.0 by construction; inter-set pairs
    * inherit the set pair's payload. Each doc belongs to exactly one
    * set and each unordered set pair appears once, so no doc pair is
    * emitted twice — no doc-level distinct needed. The per-set
    * quadratic blow-up in the intra self-join is output volume, not
    * intermediate volume: every emitted row is an answer row.
    */
  private def expandSetPairs(docMap: DataFrame, idCol: String,
      setPairs: DataFrame, intraPayload: Seq[Column]): DataFrame = {
    val payload = setPairs.columns.toSeq
      .filterNot(Set("rep_a", "rep_b")).map(col)
    // All three joins unhinted: docMap is two longs per doc and cached,
    // so AQE's runtime stats broadcast it at local scales and shuffle it
    // when it is genuinely corpus-sized; the emitted rows are answer
    // rows either way.
    val intra = docMap.as("x").join(docMap.as("y"), "rep")
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("doc_a") +:
        col(s"y.$idCol").as("doc_b") +: intraPayload: _*)
    val inter = setPairs
      .join(docMap.select(col(idCol).as("id_a"), col("rep").as("rep_a")),
        "rep_a")
      .join(docMap.select(col(idCol).as("id_b"), col("rep").as("rep_b")),
        "rep_b")
      .select(least(col("id_a"), col("id_b")).as("doc_a") +:
        greatest(col("id_a"), col("id_b")).as("doc_b") +: payload: _*)
    intra.unionAll(inter)
  }

  /** The full two-stage near-dup pipeline — banded-MinHash candidates
    * scored with EXACT distinct-shingle-set Jaccard. ADAPTIVE like
    * [[nearDupCandidates]]: on a dup-heavy corpus the intersect runs
    * once per DISTINCT shingle-set pair and [[expandSetPairs]] recovers
    * doc pairs (intra-set pairs are Jaccard 1.0 by definition); on an
    * all-unique corpus the set-level groupBy would shuffle the full
    * hash-array payload for nothing, so candidates band at doc level
    * and the arrays join only onto surviving pairs. Output either way:
    * (doc_a, doc_b, jaccard), doc_a < doc_b, unordered-unique —
    * row-identical across paths (pinned in DedupSpec).
    *
    * Verify-side joins are UNhinted in both paths: the array-carrying
    * side is distinct-set rows (rep path) or the cached doc scan (doc
    * path), and AQE's runtime sizes pick broadcast vs shuffle. The
    * historical driver-heap blowup that once forced a shuffle_hash pin
    * came from a 32M-candidate-pair × array-payload BUILD side — a
    * subtree that no longer exists in either path (candidate pairs are
    * always the streaming side or a few hundred rows).
    */
  def jaccardVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.expr.GraftFunctions.register(docs.sparkSession)
    // one scan pass computes BOTH per-doc set derivatives — the sorted
    // hash array `hs` (the exact group key, and later the Jaccard
    // intersect operand) and the MinHash signature `sg` — so no string
    // shingle survives past the scan: everything shuffled or cached
    // downstream is fixed-width longs. Group key hs, not sg: two docs
    // may share a signature with different sets, and intra-group pairs
    // are emitted as Jaccard 1.0 without an intersect. Two DIFFERENT
    // sets merge only if they collide element-for-element (~|set|
    // independent 64-bit collisions) — far below the per-pair ~1e-16
    // already accepted for the array-intersect Jaccard below. sg rides
    // the groupBy via first(): it is a function of the set (min over a
    // multiset equals min over its support), constant within a group.
    val keyed = Caches.cached(docs
      .select(col(idCol), TextOps.tokensLower(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= k)
      .select(col(idCol),
        array_distinct(TextOps.shinglesFast(col("tk"), k)).as("shset"))
      .filter(size(col("shset")) > 0)
      .select(col(idCol),
        array_sort(transform(col("shset"), s => xxhash64(s))).as("hs"),
        TextOps.minhashSignatureFast(col("shset"), numHashes).as("sg")))
    val ninter = size(array_intersect(col("ha"), col("hb")))
    // ADAPTIVE like nearDupCandidates, but keyed on the exact shingle-set
    // hash array: the set-level rewrite's groupBy shuffles the FULL ~50-
    // long[] `hs` payload per doc, which on an all-unique corpus
    // (distinct sets ≈ doc count, scripts/datagen_lowdup.py) buys
    // nothing — candidates are rare there, so the doc-level plan joins
    // the heavy arrays only onto the handful of surviving band pairs.
    // Dup-heavy corpora keep the set-level plan (intersect once per
    // distinct set pair; 32M answer pairs at sf10 never carry arrays).
    // Both paths are row-identical: identical sets collide in every
    // band, so the doc-level intersect sees them and yields exactly the
    // 1.0 the set-level path emits by construction (pinned in DedupSpec).
    // same explicit 2% rsd as nearDupCandidates — the routing margin both
    // sites document must be the one the estimator actually provides
    val st = keyed.agg(count(lit(1)).as("n"),
      approx_count_distinct(xxhash64(col("hs")), 0.02).as("nd")).head()
    val (n, nd) = (st.getLong(0), st.getLong(1))
    if (nd > n * 0.8) {
      val cand = bandPairs(keyed.select(col(idCol), col("sg")),
        idCol, "sg", bands, numHashes / bands)
      val hashed = keyed.select(col(idCol), col("hs"),
        size(col("hs")).as("n"))
      cand
        .join(hashed.select(col(idCol).as("doc_a"), col("hs").as("ha"),
          col("n").as("na")), "doc_a")
        .join(hashed.select(col(idCol).as("doc_b"), col("hs").as("hb"),
          col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(ninter.cast("double") /
            (col("na") + col("nb") - ninter), 6).as("jaccard"))
    } else {
      repPathCount.incrementAndGet()
      val (docMap, reps) = groupReps(keyed, idCol, "hs", Seq("sg"))
      val setCand = bandPairs(
          reps.select(col("rep").as(idCol), col("sg")), idCol, "sg",
          bands, numHashes / bands)
        .select(col("doc_a").as("rep_a"), col("doc_b").as("rep_b"))
      val hashed = reps.select(col("rep"), col("hs"),
        size(col("hs")).as("n"))
      // verify joins unhinted: the build side is distinct-set rows (AQE
      // broadcasts it when the corpus is dup-heavy, shuffles when not);
      // the doc-level predecessor pinned shuffle_hash here because its
      // build side was 32M candidate pairs × array payloads that a
      // static size underestimate once chose to broadcast — that
      // subtree no longer exists.
      val setJac = setCand
        .join(hashed.select(col("rep").as("rep_a"), col("hs").as("ha"),
          col("n").as("na")), "rep_a")
        .join(hashed.select(col("rep").as("rep_b"), col("hs").as("hb"),
          col("n").as("nb")), "rep_b")
        .select(col("rep_a"), col("rep_b"),
          round(ninter.cast("double") /
            (col("na") + col("nb") - ninter), 6).as("jaccard"))
      expandSetPairs(docMap, idCol, setJac, Seq(lit(1.0d).as("jaccard")))
    }
  }

  /** SimHash near-duplicate pairs: 64-bit token-level SimHash → `bands`
    * equal-width bit bands → bucket self-join on (band, bits) → exact
    * Hamming distance on the joined pairs → keep `maxHamming` or less.
    * Output: (doc_a, doc_b, hamming), doc_a < doc_b, one row per pair.
    *
    * EXACT, not approximate, for maxHamming <= bands - 1: k bit flips
    * touch at most k bands, so two fingerprints within Hamming k still
    * agree on >= bands - k full bands (pigeonhole) and are guaranteed to
    * collide in some bucket. The default 4x16-bit banding is therefore a
    * lossless Hamming<=3 join.
    *
    * Scale shape: same as the MinHash LSH join — candidates come only
    * from shared 16-bit buckets (expected bucket size n/65536 per band
    * under a uniform fingerprint distribution), the join is pinned
    * shuffled-hash on the band key, and the Hamming check runs on two
    * longs (bit_count of xor halves, whole-stage codegen) before the
    * distinct. No all-pairs product anywhere. A corpus large enough to
    * crowd 16-bit buckets scales by widening the band (bands=2 → 32-bit
    * buckets, exact for Hamming<=1) — band width, not algorithm, is the
    * scale knob.
    */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(bands >= 2 && 64 % bands == 0, "bands must divide 64 (>= 2)")
    require(maxHamming <= bands - 1,
      s"banding is only exact for maxHamming <= bands-1 " +
        s"(got maxHamming=$maxHamming, bands=$bands)")
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val w = 64 / bands
    // long fingerprint end to end: codegen'd simhash64, band keys by
    // shift+mask, Hamming by bit_count(xor) — no string round trips
    // Cached: fp feeds five subtrees below (fingerprint distinct, both
    // sides of the intra-cluster self-join, both id-expansion joins) and
    // the tokenize+hash scan is the single most expensive leaf — without
    // the cache Spark recomputes it per subtree (no common exchange to
    // reuse). Released by the harness via Caches.releaseAll after the
    // query's action, per that object's contract.
    val fp = Caches.cached(docs
      .select(col(idCol), TextOps.tokensLower(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col(idCol), TextOps.simhash64Fast(col("tk")).as("sh")))
    // Fingerprint-level LSH, doc-level only for the final expansion.
    // A near-dup corpus is exactly the case where many docs SHARE a
    // fingerprint (templated/boilerplate clusters): the doc-level band
    // self-join streams |cluster_a|x|cluster_b| candidate rows for every
    // colliding fingerprint pair (measured ~2e9 at the 100x scale point,
    // where 500k docs carry only ~5k distinct fingerprints), all to
    // re-verify the same 64-bit Hamming distance. Banding over DISTINCT
    // fingerprints does that verify once per fingerprint pair (~2e5
    // rows), and the id joins below then emit each qualifying doc pair
    // exactly once — the only remaining large volume is the answer
    // itself. Worst case (all fingerprints unique) degenerates to the
    // doc-level join plus one 8-byte-payload distinct — same shape.
    val dfp = fp.select("sh").distinct()
    val bandRows = dfp.select(col("sh"),
      posexplode(array((0 until bands).map(i =>
        // band i = fingerprint bits [64-w*(i+1), 64-w*i) (MSB-first,
        // matching substring(bitString, i*w+1, w) of the HOF form)
        shiftrightunsigned(col("sh"), 64 - w * (i + 1))
          .bitwiseAND(lit((1L << w) - 1))): _*)).as(Seq("b", "bk")))
    val a = bandRows.select(col("sh").as("sha"), col("b"), col("bk"))
    val b = bandRows.select(col("sh").as("shb"), col("b"), col("bk"))
    // Both sides are every distinct fingerprint's band rows — pin the
    // bucket join shuffled-hash like the MinHash LSH join (never
    // broadcast a whole-corpus derivative). Candidate pairs carry
    // exactly two longs; the distinct collapses the <=bands-fold
    // band multiplicity at fingerprint (not doc) cardinality.
    val shPairs = a.join(b.hint("shuffle_hash"), Seq("b", "bk"))
      .filter(col("sha") < col("shb"))
      .select(col("sha"), col("shb"),
        bit_count(col("sha").bitwiseXOR(col("shb")))
          .cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    // Expansion to doc pairs: intra-fingerprint clusters are all
    // Hamming-0 pairs (self-join on sh, id<id); inter-fingerprint pairs
    // cross-join the two id sets through two hash joins on sh. Each doc
    // has exactly one fingerprint and each (sha<shb) pair is unique, so
    // no doc pair is emitted twice — no doc-level distinct needed.
    val intra = fp.as("x").join(fp.as("y").hint("shuffle_hash"), "sh")
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"),
        lit(0L).as("hamming"))
    val inter = shPairs
      .join(fp.select(col(idCol).as("id_a"), col("sh").as("sha"))
        .hint("shuffle_hash"), "sha")
      .join(fp.select(col(idCol).as("id_b"), col("sh").as("shb"))
        .hint("shuffle_hash"), "shb")
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("hamming"))
    intra.unionAll(inter)
  }
}
