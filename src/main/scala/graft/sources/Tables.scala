package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

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

  /** Per-JVM scratch directory for (prefix, key) — for façade queries that
    * round-trip the corpus through another format or build a throwaway
    * index. One `Files.createTempDirectory` PER INVOCATION leaks a full
    * corpus/index copy each call (a 3-pass bench over the façade writes
    * each artifact dozens of times, growing /tmp without bound); one
    * memoized dir per (artifact, corpus), overwritten in place by the
    * mode("overwrite") writers, bounds /tmp at one copy per artifact per
    * JVM — and a shutdown hook removes even that.
    */
  private val scratch = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def scratchDir(prefix: String, key: String): String =
    scratch.computeIfAbsent(s"$prefix|$key", _ => {
      val d = java.nio.file.Files.createTempDirectory(prefix)
      sys.addShutdownHook {
        import java.nio.file._
        try Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () } // best-effort; /tmp is disposable
      }
      d.toString
    })

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // the generator has shipped events.ts as TIMESTAMP(NANOS), TIMESTAMP_NTZ
      // and TIMESTAMP(MICROS) across regenerations — dispatch on what the
      // reader OBSERVES, never assume a unit
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      eventsTsNormalizer(raw.schema("ts").dataType)(raw)
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** The `ts`-normalizing transform keyed on the type the parquet reader
    * observed for `events.ts` — ONE dispatch shared by the batch reader
    * ([[load]]) and the stream reader
    * ([[graft.streaming.EventsStream.readStream]]), so batch and stream can
    * never disagree about a file's timestamp unit (the round-9 regression:
    * the stream path hard-coded the nanos assumption and a testdata
    * regeneration to micros shifted every streamed event 1000×). Fails loud
    * on any other type: silently guessing a unit is a thousand-fold error.
    */
  def eventsTsNormalizer(observed: DataType): DataFrame => DataFrame = observed match {
    // TIMESTAMP(NANOS), surfaced as a raw nanos long under
    // spark.sql.legacy.parquet.nanosAsLong (the vectorized reader otherwise
    // rejects the unit); the generator emits microsecond-precision values,
    // so the truncation is lossless
    case LongType => _.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    // files written isAdjustedToUTC=false read as TIMESTAMP_NTZ, which time
    // functions like unix_micros reject — normalize (session TZ is pinned
    // UTC, so the instant is unchanged)
    case TimestampNTZType => _.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => identity
    case other => throw new IllegalArgumentException(
      s"events.ts read as unsupported type ${other.sql} — expected " +
        "TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP; refusing to guess the unit")
  }

  /** Observed on-disk schema of an events parquet file/directory plus the
    * matching [[eventsTsNormalizer]]. The schema comes from a batch read —
    * a footer sniff, no data pass — because file-stream sources cannot
    * infer schemas: `readStream` forces exactly what the footer declares
    * and applies the same normalizer the batch path uses.
    */
  def eventsStreamSchema(spark: SparkSession, path: String): (StructType, DataFrame => DataFrame) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val observed = spark.read.parquet(path).schema
    (observed, eventsTsNormalizer(observed("ts").dataType))
  }

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
