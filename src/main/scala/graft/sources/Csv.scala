package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV corpus source/sink — the lowest-common-denominator interchange format
  * (spreadsheet exports, DB dumps, the reference's external tables:
  * `/root/reference/omop_etl/etl.py` reads declared-DDL CSVs). The 100 TB
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
    // tell them apart and the reader nulls both. The only sound guard is
    // PRE-write: refuse the corpus when any string field equals the
    // sentinel. Cost: one extra column-pruned scan of the string columns
    // before the export — the price of a lossless certificate on a
    // format with no native null. Loud > lossy.
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    if (strCols.nonEmpty) {
      import org.apache.spark.sql.functions.col
      val clash = df.filter(strCols.map(c => col(c) === NullSentinel)
        .reduce(_ || _)).limit(1).count()
      require(clash == 0L,
        s"Csv.write: a row's string field is literally the null sentinel " +
          s"'$NullSentinel' — the CSV writer would emit it byte-identical " +
          "to a real null and the reader would null it on read-back. " +
          "Ship this corpus as JSONL/parquet, or rewrite the offending " +
          "text.")
    }
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("nullValue", NullSentinel)
      .option("emptyValue", "\"\"")
      .csv(path)
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
