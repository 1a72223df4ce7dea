package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines corpus source/sink — the interchange format LLM corpora
  * actually ship in (one JSON object per line; Common Crawl derivatives,
  * instruction sets, and most public releases are JSONL before anyone
  * converts them to parquet).
  *
  * The 100 TB reading rules this module encodes:
  *   - **Explicit schema, always.** Schema inference is a second full scan
  *     of the corpus before the real one; `read` takes a `StructType` and
  *     never infers. (The reference's analog: external CSVs are read
  *     against declared DDL, `/root/reference/schema/external.sql:1`.)
  *   - **PERMISSIVE with a visible corrupt-record column.** One malformed
  *     line among billions must not kill the job (FAILFAST) nor vanish
  *     silently (DROPMALFORMED): bad lines surface as rows with the
  *     payload in `_corrupt` and every data column null, so the ingest
  *     audit can count and sample them ([[corruptRecords]]).
  *   - **Splittability is a codec decision.** Uncompressed/zstd/bzip2
  *     JSONL splits into per-block tasks; a .json.gz file is ONE task no
  *     matter its size — the classic accidental single-threaded ingest.
  *     The writer here emits uncompressed parts whose parallelism follows
  *     the upstream partitioning.
  */
object Jsonl {

  val CorruptCol = "_corrupt"

  /** The documents-table schema — the canonical copy lives with the source
    * registry ([[Tables.documentsSchema]]); this alias keeps the format
    * module's API.
    */
  val documentsSchema: StructType = Tables.documentsSchema

  /** Read JSONL with an explicit schema; malformed lines become rows with
    * only [[CorruptCol]] set (PERMISSIVE mode, no inference pass).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    // idempotent on the corrupt column: a caller passing the .schema of a
    // frame THIS function returned would otherwise hit Spark's
    // duplicate-column rejection
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else schema.add(CorruptCol, StringType)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** [[read]] for the documents corpus, malformed lines dropped
    * (DROPMALFORMED — a filter on the corrupt column would make every
    * pruned-scan query, `count()` included, a corrupt-column-only scan,
    * which Spark rejects). Audit the drop rate FIRST with
    * [[read]]+[[corruptRecords]]; this reader is the ingest path.
    */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** The malformed lines of a [[read]] frame — count/sample these in the
    * ingest audit before dropping them. Returns FULL rows (data columns
    * all null, payload in [[CorruptCol]]): Spark rejects a JSON scan whose
    * only referenced column is the corrupt-record column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so keep at
    * least one data column referenced downstream — or cache the parsed
    * frame first, as the Spark docs recommend for corrupt-only audits.
    */
  def corruptRecords(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)

  /** Write a frame as JSONL parts (one object per line, uncompressed —
    * see the splittability note above).
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Façade query: prove the JSONL path is LOSSLESS by round-tripping the
    * parquet documents table through JSONL and summarizing the re-read
    * copy — per-lang counts, char volume, and an order-independent
    * content digest (bit_xor of a 60-bit md5 prefix — md5, not xxhash64,
    * because the DuckDB oracle computes the SAME digest from the parquet
    * originals; only a bit-exact round trip can hash-match). The oracle
    * never sees the JSONL side, so a match certifies the format
    * conversion end to end.
    */
  def src_jsonl(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Tables.scratchDir("graftjsonl", dir)
    write(Tables.loadParallel(spark, dir, "documents"), tmp)
    corpusSummary(readDocuments(spark, tmp))
  }

  /** Per-lang count/volume/content-digest summary — the round-trip
    * certificate shared by [[src_jsonl]] and [[Orc.src_orc]] (one oracle,
    * computed from the parquet originals, certifies any format's
    * conversion). The digest hashes doc_id WITH the text
    * ([[Sinks.writeManifest]]'s documented pitfall): a text-only xor lets
    * duplicate-text pairs cancel to zero — the corpus carries real
    * duplicates, and an identical writer mangle of both copies would have
    * passed the certificate undetected.
    */
  private[sources] def corpusSummary(df: DataFrame): DataFrame = {
    // null-PROPAGATING concat (not concat_ws): a null-text row must hash to
    // NULL so bit_xor skips it — exactly what the DuckDB twin's
    // `doc_id || '|' || text` does. concat_ws would skip only the NULL arg
    // and contribute md5(doc_id), silently failing certification on any
    // corpus with null-text docs.
    val digest = bit_xor(conv(substring(
      md5(concat(col("doc_id").cast("string"), lit("|"), col("text"))),
      1, 15), 16, 10).cast("long"))
    df.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        digest.as("content_digest"))
      .orderBy("lang")
  }
}
