package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC corpus source/sink — the other columnar format Spark reads natively
  * (no extra package; Hive-ecosystem corpora ship in it). Same scale rules
  * as parquet: columnar projection + predicate pushdown at the scan,
  * splittable stripes, explicit schema on read ([[Tables.documentsSchema]]
  * — inference is a wasted scan on any columnar format too, since it
  * still opens every file's footer).
  */
object Orc {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Tables.documentsSchema).orc(path)

  /** Façade query: certify the parquet→ORC→read round trip with the SAME
    * per-lang summary (and the same parquet-only oracle) as
    * [[Jsonl.src_jsonl]] — a hash match proves the ORC path bit-exact.
    */
  def src_orc(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Tables.scratchDir("graftorc", dir)
    write(Tables.loadParallel(spark, dir, "documents"), tmp)
    Jsonl.corpusSummary(readDocuments(spark, tmp))
  }
}
