package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the SemDeDup family: times the inline operator
  * (re-derives cells from literal centroids per run) against
  * [[Dedup.dd_semdedup_indexed]] reading a persisted
  * [[Similarity.writeIvfPqIndex]] layout — the build-once/sweep-many
  * shape a recurring curation job runs — on the same corpus, and reports
  * the flagged/keep totals so the two sweeps are comparable. On a
  * replicated corpus this also exercises the exact-dup clique collapse:
  * every clique costs flag rows, never clique² within-cell pairs.
  *
  * Usage: `graft.operators.SemDedupScaleBench [embDir] [indexPath] [reps]`;
  * prints one JSON line. The index must already exist (build it with
  * [[IvfPqBench]], which reports the one-time build cost separately).
  */
object SemDedupScaleBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val path = args.lift(1).getOrElse(
      sys.error("pass the index path (build with graft.operators.IvfPqBench)"))
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = graft.sources.Tables.loadParallel(spark, dir, "embeddings").count()
    def sweep(f: () => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      var out = (0.0, 0L, 0L)
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        // coalesce: sum over zero rows is null — an empty embeddings dir
        // should report zeros, not NPE (same guard as semdedupAudit's stats)
        val audit = f().agg(coalesce(sum("n_dups"), lit(0L)),
          coalesce(sum("n_keep"), lit(0L))).first()
        out = ((System.nanoTime() - t0) / 1e9, audit.getLong(0), audit.getLong(1))
      }
      out // last rep = warm
    }
    val (inlineSec, inDups, inKeep) = sweep(() => Dedup.dd_semdedup(spark, dir))
    val (indexedSec, ixDups, ixKeep) =
      sweep(() => Dedup.dd_semdedup_indexed(spark, dir, path))
    // streaming mode: the whole corpus through EmbStream.semanticDedupGate
    // on the SAME persisted cells, as a one-shot file stream — measures the
    // realized per-row witness-scan cost (O(|cell state|) cosines per
    // arrival) that the gate's scaladoc bounds by stateCap
    val cents = graft.streaming.EmbStream.centroidsOf(spark, path)
    val sch = graft.sources.Tables.load(spark, dir, "embeddings").schema
    // testdata tables are single parquet FILES and the file-stream source
    // insists on a directory — stage a symlink dir (zero copy; memoized
    // scratch dir, not a per-run temp leak)
    val streamDir = java.nio.file.Paths.get(
      graft.sources.Tables.scratchDir("graftembstream", dir))
    graft.sources.Tables.ensureSymlink(streamDir.resolve("embeddings.parquet"),
      java.nio.file.Paths.get(s"$dir/embeddings.parquet").toAbsolutePath)
    // clock starts AFTER staging: stream_gate_us_per_row claims the
    // per-row witness-scan cost, so filesystem setup must not inflate it
    // (query cold-start remains in — it is part of running the gate)
    val t0 = System.nanoTime()
    val gq = graft.streaming.EmbStream.semanticDedupGate(
        spark.readStream.schema(sch).parquet(streamDir.toString), cents)
      .writeStream.format("noop").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    gq.awaitTermination()
    val streamSec = (System.nanoTime() - t0) / 1e9
    val usPerRow = if (n == 0) 0.0 else streamSec * 1e6 / n
    println(s"""{"metric":"semdedup_scale","vectors":$n,""" +
      s""""inline_sec":$inlineSec,"inline_dups":$inDups,"inline_keep":$inKeep,""" +
      s""""indexed_sec":$indexedSec,"indexed_dups":$ixDups,"indexed_keep":$ixKeep,""" +
      s""""stream_gate_sec":$streamSec,"stream_gate_us_per_row":$usPerRow}""")
    spark.stop()
  }
}
