package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks for the text/dedup pipeline operators —
  * built from `org.apache.spark.sql.functions` higher-order array functions
  * so everything stays inside whole-stage codegen (no UDFs in the hot path).
  */
object TextFunctions {

  /** Whitespace tokenization (the documents corpus is single-space
    * separated).
    */
  def words(text: Column): Column = split(text, " ")

  /** Canonical text normalization (shared by `tx_norm` and
    * `pipeline_curate`, mirrored by the DuckDB oracles): lowercase, strip
    * everything outside [a-z0-9 ], collapse whitespace runs, trim.
    * Idempotent by construction — the output alphabet is a fixed point of
    * every pass (property-tested in CurationSpec). Native expression
    * ([[NormalizeText]], one byte pass) — the two-regex composed form
    * below cost 100 s per pass over 1.5M documents; parity-spec'd
    * string-identical.
    */
  def normalize(text: Column): Column = NormalizeText.of(text)

  /** The composed two-regex reference form of [[normalize]] — the parity
    * oracle for the native expression (and the exact chain the DuckDB
    * oracle twins run), not used in any operator path.
    */
  private[graft] def normalizeComposed(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Word n-gram shingles: sliding windows of `n` tokens joined by a space.
    * Native expression ([[Shingles]]) — the composed HOF form below hid a
    * quadratic re-split (the lambda body carries the `split` subtree, and
    * interpreted HOFs re-evaluate it per element: once per shingle).
    * Parity-spec'd bit-identical.
    */
  def shingles(text: Column, n: Int): Column = Shingles.of(text, n)

  /** The composed-HOF reference form of [[shingles]] — the parity oracle
    * for the native expression, not used in any operator path.
    */
  private[graft] def shinglesComposed(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) < n, array(concat_ws(" ", w)))
      .otherwise(transform(
        sequence(lit(0), size(w) - lit(n)),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
  }

  /** Distinct shingles pre-hashed to 64-bit — the string hashing happens
    * exactly once per shingle. Materialize this with `withColumn` BEFORE
    * computing [[minhash]]: staged as its own projection, CollapseProject
    * keeps it (non-cheap, referenced k times); built inline it would be
    * re-evaluated per hash family.
    */
  def hashedShingles(text: Column, n: Int): Column =
    array_distinct(transform(shingles(text, n), x => xxhash64(x)))

  /** MinHash signature of length `k` over pre-hashed shingles: family i's
    * value is min over shingles of `xxhash64(h, i)` — k cheap long-rehashes
    * per shingle instead of k string hashes. Fully deterministic. Native
    * expression ([[MinHashSig]]) — the composed HOF form below ran
    * interpreted at k×|shingles| boxed calls per document on the streaming
    * ingest path; parity-spec'd bit-identical.
    */
  def minhash(hashedShingleArr: Column, k: Int): Column =
    MinHashSig.sig(hashedShingleArr, k)

  /** The composed-HOF reference form of [[minhash]] — the parity oracle
    * for the native expression, not used in any operator path.
    */
  private[graft] def minhashComposed(hashedShingleArr: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      s => array_min(transform(hashedShingleArr, h => xxhash64(h, s))))

  /** LSH band keys: the signature split into `bands` equal bands, each
    * hashed — docs sharing any band key are near-dup candidates.
    */
  def minhashBands(sig: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0,
      s"minhashBands: bands=$bands must divide k=$k — a remainder would " +
        "silently drop the trailing signature entries from every band key " +
        "(paid-for families with zero recall contribution)")
    val rows = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",", slice(sig, b * lit(rows) + 1, lit(rows))), b))
  }

  /** 64-bit SimHash over the word multiset: each word votes ±1 on every bit
    * of its xxhash64; the fingerprint keeps bits with positive balance.
    * Native expression ([[SimHash64]]) — the composed fold below ran
    * interpreted AND re-hashed each word once per bit (the inner lambda
    * carries `xxhash64(w)`); parity-spec'd bit-identical.
    */
  def simhash64(text: Column): Column = SimHash64.of(text)

  /** Winnowing selection: distinct sliding-window minima of a hash array.
    * Native ([[WinnowSelect]]); the composed form is its parity oracle.
    */
  def winnowSelect(hs: Column, w: Int): Column = WinnowSelect.of(hs, w)

  private[graft] def winnowSelectComposed(hs: Column, w: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(hs) - w, lit(0))),
      i => array_min(slice(hs, i + 1, lit(w)))))

  /** The composed-HOF reference form of [[simhash64]] — the parity oracle
    * for the native expression, not used in any operator path.
    */
  private[graft] def simhash64Composed(text: Column): Column = {
    val votes = aggregate(
      words(text),
      array_repeat(lit(0), 64),
      (acc, w) => {
        val h = xxhash64(w)
        // functions.shiftright only takes a literal shift — call the SQL
        // function form to shift by the lambda-bound bit index
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, b) => a + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, lit(1)).otherwise(lit(-1)))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Cosine similarity of two float-array embeddings, computed in double.
    * Single `aggregate` pass over the zipped arrays; summation order is the
    * array order on every engine, so results are bit-deterministic.
    */
  def cosine(a: Column, b: Column): Column = {
    val dots = aggregate(
      zip_with(a, b, (x, y) => struct(
        (x.cast("double") * y.cast("double")).as("xy"),
        (x.cast("double") * x.cast("double")).as("xx"),
        (y.cast("double") * y.cast("double")).as("yy"))),
      struct(lit(0.0).as("xy"), lit(0.0).as("xx"), lit(0.0).as("yy")),
      (acc, p) => struct(
        (acc("xy") + p("xy")).as("xy"),
        (acc("xx") + p("xx")).as("xx"),
        (acc("yy") + p("yy")).as("yy")))
    dots("xy") / (sqrt(dots("xx")) * sqrt(dots("yy")))
  }
}
