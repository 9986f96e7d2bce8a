package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality stats, language ID, fingerprinting. All pure
  * expression trees (no UDFs) — codegen-friendly, shuffle-free per row,
  * and DuckDB-comparable.
  */
object TextOps {

  /** Whitespace tokens of trimmed text, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Lowercased whitespace tokens. */
  def tokensLower(text: Column): Column = tokens(lower(text))

  /** BPE-ish tokenizer: letter runs, digit runs, single punctuation. */
  def bpeTokens(text: Column): Column =
    call_function("regexp_extract_all", text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Normalized form for fingerprinting: lowercase, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Count of punctuation (non-alphanumeric, non-space) characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))

  /** Count of tokens that appear in `stopwords`. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  /** Sum of token lengths (for mean token length). */
  def totalTokenLen(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t))

  /** Word k-shingles (k consecutive tokens joined by one space) —
    * the unit for MinHash / Jaccard near-dup detection.
    * Requires size(toks) >= k (filter first).
    */
  def shingles(toks: Column, k: Int): Column =
    transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))

  /** Character n-grams of a string (positions 1..len-n+1).
    * Requires length(text) >= n (filter first).
    */
  def charGrams(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), length(text) - (n - 1)),
      i => text.substr(i, lit(n)))

  /** One MinHash value: min over shingles of md5(seedTag | shingle).
    * Lexicographic min over fixed-width hex == numeric min — portable
    * across engines (the DuckDB oracle uses the same trick).
    */
  def minhash(shingleArr: Column, seed: Column): Column =
    array_min(transform(shingleArr, s => md5(concat(seed, lit("|"), s))))

  /** Full k-function MinHash signature as array<string>. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), h => minhash(shingleArr, h))

  /** LSH band key b (bands of `rowsPerBand` signature values): the banded
    * hash that buckets near-duplicate candidates — groupBy(band) join, never
    * an all-pairs crossJoin.
    */
  def bandKey(signature: Column, band: Int, rowsPerBand: Int): Column =
    md5(concat_ws("", (0 until rowsPerBand).map(r =>
      element_at(signature, band * rowsPerBand + r + 1)): _*))

  /** Bit j (0..31) of a token: hex digit j/4 of md5(token), bit (3 - j%4)
    * of that digit. Pure arithmetic so DuckDB reproduces it exactly.
    */
  private def md5Bit(t: Column, j: Column): Column = {
    val digit = md5(t).substr(floor(j / 4).cast("int") + 1, lit(1))
    val v = call_function("instr", lit("0123456789abcdef"), digit) - 1
    floor(v / pow(lit(2.0), lit(3) - j % 4)).cast("int") % 2
  }

  /** 32-bit SimHash as a '0'/'1' bitstring: per token take the first 8 hex
    * digits of md5, accumulate +/-1 per bit over all tokens, emit sign bits.
    * A shuffle-free per-row fold — exactly what you want at 100 TB.
    */
  def simhash32(toks: Column): Column = {
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 32),
      (acc, t) =>
        zip_with(
          acc,
          transform(sequence(lit(0), lit(31)), j => md5Bit(t, j)),
          (x, y) => x + y * 2 - 1))
    array_join(
      transform(counts, c => when(c > 0, lit("1")).otherwise(lit("0"))), "")
  }
}
