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
      textCol: String = "text"): Unit =
    docs
      .withColumn("shard", pmod(xxhash64(col(textCol)), lit(shards)).cast("int"))
      .repartition(shards, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)

  /** JSONL (newline-delimited JSON) interchange — the lingua franca of
    * text-corpus releases. Write: one JSON object per line, gzip-splittable
    * only at file granularity, so shard count = task parallelism downstream;
    * read: schema given explicitly (inference would scan twice and type
    * drift across shards). Parquet remains the internal format — JSONL is
    * the import/export edge.
    */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 8): Unit =
    df.repartition(shards).write.mode("overwrite").json(path)

  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

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
