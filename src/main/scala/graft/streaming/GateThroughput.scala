package graft.streaming

import org.apache.spark.sql.streaming.Trigger

/** Realized ingest-edge throughput of [[DocsStream.langidGate]] — the
  * replication-spot drive for the streaming language gate (SURVEY §8.5):
  * the documents table at `dir` replayed as a one-shot file stream
  * through the gate to a noop sink, wall-clocked per rep. The weight
  * table is trained on `weightsDir` (a per-snapshot BATCH artifact by
  * contract — train on the base corpus, gate the N× replica: the gate
  * spot must price the stateless map, not the trainer whose scale curve
  * tx_langid2's own spot already records).
  *
  * Usage: `tools/run.sh graft.streaming.GateThroughput [dir] [weightsDir]
  * [reps] [keep]` — defaults sf0.1, =dir, 3, `en,zh`. Prints one JSON
  * line; `min` is the warm per-row cost, rep 1 carries query cold-start.
  */
object GateThroughput {

  /** Streamable directory for `dir`'s documents table. The file-stream
    * source lists ONE directory level and does not recurse: a
    * driver-style single-FILE table needs the symlink-parent staging
    * (the SemDedupScaleBench device — zero copy, memoized scratch dir),
    * while a [[graft.Replicate]]-style DIRECTORY of part files is itself
    * the correct stream dir (staging its parent would list zero files
    * and time an empty stream as if it were fast).
    */
  private[streaming] def stageStreamDir(dir: String): String = {
    val docsPath = java.nio.file.Paths.get(s"$dir/documents.parquet")
    val streamDir =
      if (java.nio.file.Files.isDirectory(docsPath)) docsPath
      else {
        val staged = java.nio.file.Paths.get(
          graft.sources.Tables.scratchDir("graftdocstream", dir))
        graft.sources.Tables.ensureSymlink(
          staged.resolve("documents.parquet"), docsPath.toAbsolutePath)
        staged
      }
    streamDir.toString
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val weightsDir = args.lift(1).getOrElse(dir)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val keep = args.lift(3).getOrElse("en,zh").split(",").toSet
    val spark = graft.DriverSession.build(defaultCpus = "32")

    val weights =
      graft.operators.TextAnalysis.trainLangidWeights(spark, weightsDir, 8)
    val n = graft.sources.Tables.load(spark, dir, "documents").count()

    val streamDir = stageStreamDir(dir)

    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val q = DocsStream.langidGate(
          spark.readStream.schema(graft.sources.Tables.documentsSchema)
            .parquet(streamDir),
          weights, keep)
        .writeStream.format("noop").outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    val usPerRow = if (n == 0) 0.0 else times.min * 1e6 / n
    println(s"""{"metric":"langid_gate_throughput","rows":$n,""" +
      s""""gate_sec":${times.min},"gate_all":[${times.mkString(",")}],""" +
      s""""us_per_row":$usPerRow,"keep":"${keep.toSeq.sorted.mkString(",")}"}""")
    spark.stop()
  }
}
