package graft.streaming

import org.apache.spark.sql.streaming.Trigger

/** Realized ingest-edge throughput of the embeddings-side gates — the
  * [[ChainThroughput]] symmetry for the vector edge (SURVEY §8.5): the
  * embeddings table at `dir` replayed as a one-shot file stream through
  * (a) [[EmbStream.diversityGate]] alone and (b) the composed
  * [[EmbStream.embChain]] (semantic dedup → diversity), each to a noop
  * sink, wall-clocked per rep.
  *
  * The dedup stage's coarse centroids are the SAME deterministic
  * [[graft.operators.Clustering.initCentroids]] seed the batch
  * dd_semdedup uses, trained on `artifactDir` (per-snapshot batch value;
  * for N× replica spots pass the 1× base — the [[GateThroughput]]
  * contract). The admitted/retained census comes from the TIMED chain
  * run's own emb_div observe() metrics summed across its progress
  * events — exact whatever the micro-batch split, so the printed census
  * is the measured stream's, not a batch stand-in's.
  *
  * Usage: `tools/run.sh graft.streaming.EmbChainThroughput [dir]
  * [artifactDir] [reps] [kPerShard] [shards]` — defaults sf0.1, =dir,
  * 3, 8, 4. Prints one JSON line; `min` is the warm per-row cost, rep 1
  * carries query cold-start.
  */
object EmbChainThroughput {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val artifactDir = args.lift(1).getOrElse(dir)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val kPerShard = args.lift(3).map(_.toInt).getOrElse(8)
    val shards = args.lift(4).map(_.toInt).getOrElse(4)
    val spark = graft.DriverSession.build(defaultCpus = "32")

    val tA = System.nanoTime()
    val cents = graft.operators.Clustering.initCentroids(
      graft.sources.Tables.loadParallel(spark, artifactDir, "embeddings"), 10)
    val artifactSec = (System.nanoTime() - tA) / 1e9

    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val n = emb.count()

    val embPath = java.nio.file.Paths.get(s"$dir/embeddings.parquet")
    val streamDir =
      if (java.nio.file.Files.isDirectory(embPath)) embPath
      else {
        val staged = java.nio.file.Paths.get(
          graft.sources.Tables.scratchDir("graftembstream", dir))
        graft.sources.Tables.ensureSymlink(
          staged.resolve("embeddings.parquet"), embPath.toAbsolutePath)
        staged
      }
    val sch = spark.read.parquet(embPath.toString)
      .select("vec_id", "embedding").schema

    // census accumulated from the TIMED streamed runs' own observe()
    // metrics (emb_div: rows/admitted/retained), summed across every
    // micro-batch progress event — exact however the file source splits
    // the replay (a separate batch pass would equal the stream only
    // under a single-batch replay of these stateful stages).
    // recentProgress is a RING BUFFER (numRecentProgressUpdates) — size
    // it above any plausible split and refuse a saturated read instead
    // of silently undercounting the earliest batches
    val progressCap = 10000
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      progressCap.toString)
    val census = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    def drive(observed: Boolean)(
        mk: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.Dataset[_]): Seq[Double] =
      (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        val q = mk(spark.readStream.schema(sch).parquet(streamDir.toString)
            .select("vec_id", "embedding"))
          .writeStream.format("noop").outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        if (observed && rep == 1) {
          val progress = q.recentProgress
          require(progress.length < progressCap,
            s"EmbChainThroughput: $progressCap progress events — the " +
              "ring buffer may have dropped early batches and the census " +
              "would undercount; raise numRecentProgressUpdates")
          progress.foreach { p =>
            Option(p.observedMetrics.get("emb_div")).foreach { r =>
              census("div_rows") += r.getAs[Long]("rows")
              census("admitted") += r.getAs[Long]("admitted")
              census("retained") += r.getAs[Long]("retained")
            }
          }
        }
        dt
      }

    val divTimes = drive(observed = false)(df =>
      EmbStream.diversityGate(df, kPerShard, shards))
    val chainTimes = drive(observed = true)(df =>
      EmbStream.embChain(df, cents, kPerShard = kPerShard, shards = shards))
    val admitted = census("admitted")
    val retained = census("retained")

    def us(t: Seq[Double]): Double = if (n == 0) 0.0 else t.min * 1e6 / n
    println(s"""{"metric":"emb_chain_throughput","rows":$n,""" +
      s""""admitted":$admitted,"retained":$retained,""" +
      s""""div_sec":${divTimes.min},"div_all":[${divTimes.mkString(",")}],""" +
      s""""div_us_per_row":${us(divTimes)},""" +
      s""""chain_sec":${chainTimes.min},""" +
      s""""chain_all":[${chainTimes.mkString(",")}],""" +
      s""""chain_us_per_row":${us(chainTimes)},""" +
      s""""artifact_sec":$artifactSec,""" +
      s""""k_per_shard":$kPerShard,"shards":$shards}""")
    spark.stop()
  }
}
