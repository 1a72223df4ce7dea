package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV corpus source/sink — the lowest-common-denominator interchange format
  * (spreadsheet exports, DB dumps, the reference's external tables:
  * `/root/reference/external/` holds the CSVs, loaded by
  * `/root/reference/tests/test_rules.py:123-126`). The 100 TB
  * rules CSV adds on top of the JSONL ones ([[Jsonl]]):
  *   - **Quoting is load-bearing.** Free text carries the delimiter, the
  *     quote char, and (in real corpora) newlines; the writer quotes ALL
  *     fields so the reader never mis-splits, and the reader runs in
  *     `multiLine` mode so quoted embedded newlines parse. multiLine makes
  *     a CSV file ONE task regardless of size — the same accidental
  *     single-threaded ingest as .json.gz — so large corpora should land
  *     in many files (the writer inherits upstream partitioning) or,
  *     better, ship as JSONL/parquet; this module exists to READ what
  *     arrives, not to recommend the format.
  *   - **NULL vs empty string is a protocol, not a guess.** CSV has no
  *     native null; writer and reader agree on an explicit `nullValue`
  *     sentinel (`\N`, the classic DB-dump convention) and quoted-empty
  *     for the empty string, so `null` text round-trips as null rather
  *     than silently becoming `""` (or vice versa) — exactly the class of
  *     corruption the certification digest would flag.
  *   - **Explicit schema, always** ([[Tables.documentsSchema]]); CSV
  *     inference is a full extra scan AND type-guesses (a numeric-looking
  *     doc becomes a double).
  */
object Csv {

  private val NullSentinel = "\\N"

  def write(df: DataFrame, path: String): Unit = {
    // Spark's CSV writer emits a NULL and a field whose text is literally
    // the sentinel as IDENTICAL bytes ("\\N" both — the backslash escape
    // applies to the text and the sentinel is written through the same
    // quoting path; verified empirically), so no post-write byte scan can
    // tell them apart and the reader nulls both. The guard is enforced
    // IN-TASK, inside the single write pass — a projection wrapping each
    // string column in a CASE that raise_error()s on the sentinel — not
    // as a separate pre-scan action: a pre-scan computes the frame twice,
    // and for a non-deterministic input (a sample/limit after a shuffle,
    // a source mutated between the two jobs) it can PASS while the write
    // still emits a sentinel-identical field that the reader silently
    // nulls, defeating the lossless certificate. In-task, the row that
    // would corrupt is the row that aborts the export. Loud > lossy.
    import org.apache.spark.sql.functions.{col, lit, when, raise_error}
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSet
    val guarded = df.select(df.columns.map { c =>
      if (strCols.contains(c))
        when(col(c) === NullSentinel, raise_error(lit(
          s"Csv.write: column '$c' has a field literally the null " +
            s"sentinel '$NullSentinel' — the CSV writer would emit it " +
            "byte-identical to a real null and the reader would null it " +
            "on read-back. Ship this corpus as JSONL/parquet, or rewrite " +
            "the offending text.")).cast("string"))
          .otherwise(col(c)).as(c)
      else col(c)
    }.toSeq: _*)
    // Write-then-swap: an in-task guard aborts MID-write, and
    // mode("overwrite") straight at `path` would have cleared a
    // pre-existing good export before the abort (the old pre-scan failed
    // with the destination untouched — keep that property). The staging
    // dir absorbs the abort; only a fully-written export replaces the
    // destination (the compactIvfPqIndex swap discipline).
    // the shared write-then-swap discipline ([[graft.AtomicSwap]]):
    // staging cleaned only when the write failed; a failed rename
    // preserves the staged copy; staging is a normalized SIBLING of the
    // destination so a trailing slash in `path` cannot nest it inside
    val dest = new org.apache.hadoop.fs.Path(path)
    val fs = dest.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    graft.AtomicSwap.writeThenSwap(fs, dest, "Csv.write") { staging =>
      guarded.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("nullValue", NullSentinel)
        .option("emptyValue", "\"\"")
        .csv(staging.toString)
    }
  }

  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Tables.documentsSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("nullValue", NullSentinel)
      .option("emptyValue", "")
      .csv(path)

  /** Façade query: certify the parquet→CSV→read round trip with the SAME
    * per-lang summary (and the same parquet-only oracle) as
    * [[Jsonl.src_jsonl]] / [[Orc.src_orc]] — a hash match proves the CSV
    * quoting/null protocol lossless end to end.
    */
  def src_csv(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Tables.scratchDir("graftcsv", dir)
    write(Tables.loadParallel(spark, dir, "documents"), tmp)
    Jsonl.corpusSummary(readDocuments(spark, tmp))
  }
}
