package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Source registry for the driver-provided synthetic tables (TESTDATA.md).
  *
  * The reference delegates storage to PostgreSQL schemas
  * (`/root/reference/schema/cerner.sql:1-2`); the rebuild's storage format is
  * parquet, registered as temp views so `spark.sql` text can be shared with
  * the DuckDB oracle verbatim.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extra: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extra

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
      // rejects; read nanos as long and truncate to microsecond timestamps
      // (the generator emits microsecond-precision values, so this is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        // files written isAdjustedToUTC=false read as TIMESTAMP_NTZ, which
        // time functions like unix_micros reject — normalize (session TZ is
        // pinned UTC, so the instant is unchanged)
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** [[load]] + guarantee at least the session's default parallelism in
    * partitions. Expression-heavy per-row pipelines (shingle hashing,
    * winnowing, vector dot products) otherwise run on however many splits
    * the SCAN yields — and a small single-row-group parquet file is one
    * unsplittable partition, pinning the whole map side to one core. At
    * real scale the scan is already split and this is a no-op; when it does
    * fire, the extra exchange moves only the raw rows once, far less than
    * the compute it unlocks.
    */
  def loadParallel(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Register every table as a temp view named exactly like its parquet file. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
