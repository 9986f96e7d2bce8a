package graft.ops

import org.apache.spark.sql.DataFrame
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
    */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val sh = docs
      .select(col(idCol), TextOps.tokensLower(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= k)
      .select(col(idCol), TextOps.shinglesFast(col("tk"), k).as("shingles"))
    nearDupCandidatesFromShingles(sh, idCol, "shingles", numHashes, bands)
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
    val rowsPerBand = numHashes / bands
    val sig = sh.select(col(idCol),
      TextOps.minhashSignatureFast(col(shingleCol), numHashes).as("sg"))
    val bandRows = sig.select(col(idCol),
      posexplode(TextOps.bandKeys(col("sg"), bands, rowsPerBand))
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
