package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side layouts for the curated corpus — the sink half of the
  * pipeline. Both writers encode the property that matters at 100 TB: the
  * LAYOUT is part of the contract, chosen so downstream reads prune (
  * partition dirs, parquet row-group min/max stats) instead of scanning.
  */
object Sinks {

  /** Content-addressed training shards: shard = xxhash64(text) mod n, so a
    * document's shard is a pure function of its content — re-ingesting,
    * re-partitioning, or incrementally appending to the corpus never moves
    * a document between shards (the property that keeps a resumable
    * tokenizer/trainer's data order stable). One `repartition` on the shard
    * id co-locates each shard; `partitionBy` writes one directory per shard
    * for direct per-worker consumption. Balance is hash-uniform: expected
    * deviation O(sqrt(rows/shards)), verified in SinksSpec.
    */
  def writeShards(docs: DataFrame, path: String, shards: Int,
      textCol: String = "text"): Unit = {
    // pmod(x, 0) is null under non-ANSI defaults: shards=0 would land every
    // row in __HIVE_DEFAULT_PARTITION__ — silently garbage layout, not an
    // error; negative counts write negative shard dirs
    require(shards > 0, s"writeShards: shards=$shards must be positive")
    docs
      .withColumn("shard", pmod(xxhash64(col(textCol)), lit(shards)).cast("int"))
      .repartition(shards, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
  }

  /** JSONL interchange, delegating to the [[Jsonl]] module — ONE JSONL
    * implementation (corrupt-record contract included), not a second one
    * that drifts. `writeJsonl` adds only the shard-count repartition (the
    * task-parallelism knob for file-granular formats); `readJsonl` returns
    * [[Jsonl.read]]'s frame, whose `_corrupt` column makes malformed lines
    * VISIBLE — the bare schema-only read surfaced them as silent all-null
    * rows.
    */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 8): Unit = {
    require(shards > 0, s"writeJsonl: shards=$shards must be positive")
    Jsonl.write(df.repartition(shards), path)
  }

  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    Jsonl.read(spark, path, schema)

  /** Per-shard release manifest for a [[writeShards]] layout: row count,
    * text bytes, and an ORDER-INDEPENDENT content digest
    * (`bit_xor(xxhash64(doc_id, text))` — partitioning, task order, and
    * file layout can never change it; keying with doc_id keeps two docs
    * with equal text from cancelling). Written to `_manifest` under the
    * corpus path — the `_` prefix keeps every parquet read of the corpus
    * itself from picking it up. Every real corpus release ships one: it is
    * what lets a consumer (or [[verifyShards]]) prove bytes survived the
    * copy without re-reading the producer's data.
    */
  def writeManifest(s: org.apache.spark.sql.SparkSession, path: String,
      textCol: String = "text"): Unit =
    shardManifest(s.read.parquet(path), textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")

  private def shardManifest(corpus: DataFrame, textCol: String): DataFrame =
    corpus.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col(textCol))).as("n_text_bytes"),
        bit_xor(xxhash64(col("doc_id"), col(textCol))).as("digest"))

  /** Recompute the manifest from the data and diff it against the stored
    * one — the receiving end of a corpus hand-off. Returns one row per
    * disagreeing shard (empty = intact): a shard missing from either side,
    * or present in both with any column off. One corpus scan, aggregated
    * per shard; no row-level comparison needed to LOCATE damage — re-pull
    * only the named shards.
    */
  def verifyShards(s: org.apache.spark.sql.SparkSession, path: String,
      textCol: String = "text"): DataFrame = {
    val stored = s.read.parquet(s"$path/_manifest")
      .select(col("shard"), col("n_docs").as("m_docs"),
        col("n_text_bytes").as("m_bytes"), col("digest").as("m_digest"))
    shardManifest(s.read.parquet(path), textCol)
      .join(stored, Seq("shard"), "full_outer")
      .filter(!(col("n_docs") <=> col("m_docs")) ||
        !(col("n_text_bytes") <=> col("m_bytes")) ||
        !(col("digest") <=> col("m_digest")))
      .orderBy("shard")
  }

  /** Pruning-friendly curated layout: directory-partitioned by `partCol`
    * (planning-time pruning), rows inside each file ordered by `sortCol` so
    * parquet row-group min/max statistics make point/range filters on it
    * skip whole row groups at runtime — the two pruning levels a 100 TB
    * reader needs before it touches a byte of data.
    */
  def writeLayout(df: DataFrame, path: String, partCol: String,
      sortCol: String): Unit =
    df
      .repartition(col(partCol))
      .sortWithinPartitions(partCol, sortCol)
      .write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)
}
