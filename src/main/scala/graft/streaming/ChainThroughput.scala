package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Realized ingest-edge throughput of the FULL C4-order chain
  * ([[DocsStream.c4Chain]]: extract→url→authority→langid→score→
  * perplexity) — the replication-spot drive that grounds the "stream
  * edge" story at chain granularity the way [[GateThroughput]] grounds
  * the single langid gate (SURVEY §8.5): the documents table at `dir`
  * replayed as a one-shot file stream through the whole chain to a noop
  * sink, wall-clocked per rep.
  *
  * All five gate artifacts are per-snapshot BATCH values by contract
  * (train on the corpus the chain will screen deltas of); their build
  * cost is reported separately (`artifact_sec`) because a deployment
  * pays it once per snapshot, not per document. The funnel census
  * (`kept`) is priced by the BATCH composition of the same chain — every
  * stage is stateless map-only, batch == stream per the per-gate parity
  * specs plus the end-to-end chain spec, so the count is the stream's.
  * The chain holds zero streaming state; the only per-query memory is
  * the shipped artifact values, whose sizes are the `artifact_census`
  * fields (authority domains, langid weight rows × dims, score weight
  * dims, LM bigram/unigram entries).
  *
  * Usage: `tools/run.sh graft.streaming.ChainThroughput [dir]
  * [artifactDir] [reps] [keep]` — defaults sf0.1, =dir, 3, `en,zh`.
  * For N× replica spots pass the 1× base as `artifactDir` (the
  * [[GateThroughput]] contract: artifacts are per-snapshot batch values
  * trained on the base corpus; the spot prices the stateless chain, not
  * the trainers, whose own scale curves §8.5 records separately).
  * Prints one JSON line; `min` is the warm per-row cost, rep 1 carries
  * query cold-start.
  */
object ChainThroughput {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val artifactDir = args.lift(1).getOrElse(dir)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val keep = args.lift(3).getOrElse("en,zh").split(",").toSet
    val spark = graft.DriverSession.build(defaultCpus = "32")

    val tA = System.nanoTime()
    val authorized = graft.operators.Graph.domainAuthority(spark, artifactDir)
      .collect().map(_.getString(0)).toSeq
    val langidW =
      graft.operators.TextAnalysis.trainLangidWeights(spark, artifactDir, 8)
    val scoreW =
      graft.operators.TextAnalysis.trainScoreWeights(spark, artifactDir, 8)
    val lm = graft.operators.TextAnalysis.perplexityLmArtifact(spark, artifactDir)
    val artifactSec = (System.nanoTime() - tA) / 1e9

    // the synthetic corpus carries no url column — derive it in the
    // corpus ADAPTER (the tx_url family's urlPlant device), outside the
    // deployment-shaped chain
    def withUrl(df: DataFrame): DataFrame =
      df.withColumn("url", graft.operators.TextAnalysis.urlPlant(col("doc_id")))
    def chain(df: DataFrame): DataFrame =
      DocsStream.c4Chain(df, authorized, langidW, keep, scoreW, lm)

    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val n = docs.count()
    val kept = chain(withUrl(docs)).count()

    val streamDir = GateThroughput.stageStreamDir(dir)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val q = chain(withUrl(
          spark.readStream.schema(graft.sources.Tables.documentsSchema)
            .parquet(streamDir)))
        .writeStream.format("noop").outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    val docsPerSec = if (times.min == 0.0) 0.0 else n / times.min
    val usPerRow = if (n == 0) 0.0 else times.min * 1e6 / n
    println(s"""{"metric":"c4_chain_throughput","rows":$n,"kept":$kept,""" +
      s""""chain_sec":${times.min},"chain_all":[${times.mkString(",")}],""" +
      s""""docs_per_sec":$docsPerSec,"us_per_row":$usPerRow,""" +
      s""""artifact_sec":$artifactSec,"artifact_census":{""" +
      s""""authority_domains":${authorized.size},""" +
      s""""langid_rows":${langidW.size},""" +
      s""""langid_dims":${langidW.headOption.map(_._2.size).getOrElse(0)},""" +
      s""""score_dims":${scoreW.size},""" +
      s""""lm_bigrams":${lm.seen.size},"lm_unigrams":${lm.c1.size}},""" +
      s""""keep":"${keep.toSeq.sorted.mkString(",")}"}""")
    spark.stop()
  }
}
