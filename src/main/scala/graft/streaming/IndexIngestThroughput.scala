package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Realized throughput of the streaming→index lifecycle
  * ([[StreamIndexIngest]]): the embeddings table split 80/20 into a
  * base slice (the batch-built sharded IVF×PQ deployment) and a delta
  * slice replayed as a MULTI-EPOCH file stream through
  * [[EmbStream.embChain]] into
  * [[graft.operators.Similarity.appendOrRetrainSharded]] per
  * micro-batch — the production vector-ingest story end to end, with
  * the epoch ledger and drift pricing live.
  *
  * Usage: `tools/run.sh graft.streaming.IndexIngestThroughput [dir]
  * [shards] [epochFiles] [select]` — defaults sf0.1, 3, 8, `all`
  * (`retained` narrows to the diversity sketch, the coreset
  * deployment). The delta is staged as `epochFiles` parquet files and
  * streamed with maxFilesPerTrigger=1, so the run commits ~epochFiles
  * epochs — each paying one id join, one drift pricing, one append.
  * Prints one JSON line: the base build cost, the streamed ingest
  * wall-clock, per-epoch delta sizes, retrain decisions, and a
  * post-ingest search probe (top-k rows returned over the merged
  * deployment — the index is live, not just bigger).
  */
object IndexIngestThroughput {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shards = args.lift(1).map(_.toInt).getOrElse(3)
    val epochFiles = args.lift(2).map(_.toInt).getOrElse(8)
    val retainedOnly = args.lift(3) match {
      case None | Some("all") => false
      case Some("retained") => true
      case Some(other) => sys.error(
        s"IndexIngestThroughput: unrecognized select '$other' — all/retained")
    }
    val spark = graft.DriverSession.build(defaultCpus = "32")

    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 0L)
    val delta = emb.filter(pmod(col("vec_id"), lit(5L)) === 0L)

    val t0 = System.nanoTime()
    val basePath = java.nio.file.Files
      .createTempDirectory("graft-ingest-idx").toString
    val paths = graft.operators.Similarity
      .writeIvfPqIndexShards(spark, base, basePath, shards)
    val cents = graft.operators.Clustering.initCentroids(base, 10)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val deltaDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-delta").toString
    delta.repartition(epochFiles).write.mode("overwrite").parquet(deltaDir)
    val ledger = java.nio.file.Files
      .createTempDirectory("graft-ingest-ledger").toString
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[StreamIndexIngest.IngestReport]

    val t1 = System.nanoTime()
    val q = EmbStream.embChain(
        spark.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", 1).parquet(deltaDir)
          .select("vec_id", "embedding"),
        cents)
      .writeStream
      // the ledger is only valid across restarts when paired with the
      // query's checkpoint (batchIds renumber otherwise — the
      // StreamIndexIngest contract); the drive models the pairing
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-ingest-ckpt").toString)
      .foreachBatch(StreamIndexIngest.sink(paths, ledger, emb,
        retainedOnly = retainedOnly,
        onReport = r => reports.synchronized { reports += r }) _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ingestSec = (System.nanoTime() - t1) / 1e9

    val ingested = reports.map(_.nDelta).sum
    val retrains = reports.flatMap(_.decisions).count(_._2)
    val perEpoch = reports.sortBy(_.epochId)
      .map(r => s"""{"epoch":${r.epochId},"n":${r.nDelta}}""")
      .mkString("[", ",", "]")
    // the merged deployment answers queries over base AND streamed rows
    val probes = emb.filter(col("vec_id") < 8)
    val hits = graft.operators.Similarity
      .searchIvfPqIndexSharded(spark, paths, probes).count()
    val codes = paths.map(p =>
      spark.read.parquet(s"$p/codes").count()).sum
    val nDelta = delta.count()
    println(s"""{"metric":"index_ingest_throughput","base_rows":${base.count()},""" +
      s""""delta_rows":$nDelta,"epochs":${reports.size},""" +
      s""""select":"${if (retainedOnly) "retained" else "all"}",""" +
      s""""ingested":$ingested,"retrains":$retrains,""" +
      s""""build_sec":$buildSec,"ingest_sec":$ingestSec,""" +
      s""""rows_per_sec":${if (ingestSec > 0) nDelta / ingestSec else 0.0},""" +
      s""""per_epoch":$perEpoch,"post_codes":$codes,"probe_hits":$hits}""")
    spark.stop()
  }
}
