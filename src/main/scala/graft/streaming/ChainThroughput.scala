package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.streaming.Trigger

/** Realized ingest-edge throughput of the FULL C4-order chain
  * ([[DocsStream.c4Chain]]: extract→url→authority→langid→score→
  * perplexity, plus the OPTIONAL decon/importance screens) — the
  * replication-spot drive that grounds the "stream edge" story at chain
  * granularity the way [[GateThroughput]] grounds the single langid gate
  * (SURVEY §8.5): the documents table at `dir` replayed as a one-shot
  * file stream through the whole chain to a noop sink, wall-clocked per
  * rep.
  *
  * All gate artifacts are per-snapshot BATCH values by contract (train
  * on the corpus the chain will screen deltas of); their build cost is
  * reported separately (`artifact_sec`) because a deployment pays it
  * once per snapshot, not per document. The funnel census (`kept`) is
  * priced by the BATCH composition of the same chain — every stage is
  * stateless map-only, batch == stream per the per-gate parity specs
  * plus the end-to-end chain spec, so the count is the stream's. The
  * chain holds zero streaming state; the only per-query memory is the
  * shipped artifact values, whose sizes are the `artifact_census` fields.
  *
  * Usage: `tools/run.sh graft.streaming.ChainThroughput [dir]
  * [artifactDir] [reps] [keep] [screens] [bm25mode]` — defaults sf0.1,
  * =dir, 3, `en,zh`, `off`, `auto`. Pass `screens=on` to run the chain
  * WITH the three decon/importance screens (URL decon over a mod-50
  * eval slice, DSIR and BM25 at survivor-quartile cuts — the parity
  * spec's recipe, so every screen ENGAGES without annihilating the
  * funnel; a deployment pins its own thresholds). `bm25mode` =
  * auto|lit|bcast pins [[DocsStream.Bm25Screen.broadcast]] for
  * crossover measurement (auto follows the size gate). For N×
  * replica spots pass the 1× base as `artifactDir` (the
  * [[GateThroughput]] contract: artifacts are per-snapshot batch values
  * trained on the base corpus; the spot prices the stateless chain, not
  * the trainers, whose own scale curves §8.5 records separately).
  * Prints one JSON line; `min` is the warm per-row cost, rep 1 carries
  * query cold-start. `artifact_sec` is the CLASSIC five-artifact build
  * (comparable across screens modes); the screens=on survivor pass +
  * threshold derivation is its own `screen_artifact_sec` field.
  */
object ChainThroughput {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val artifactDir = args.lift(1).getOrElse(dir)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val keep = args.lift(3).getOrElse("en,zh").split(",").toSet
    // both the bare flag and the scaladoc's `screens=on` spelling work —
    // a silently-ignored 5th arg would bench the unscreened chain while
    // the caller believes they measured the screened one
    val screens = args.lift(4) match {
      case None => false
      case Some("on") | Some("screens=on") => true
      case Some("off") | Some("screens=off") => false
      case Some(other) => sys.error(
        s"ChainThroughput: unrecognized screens arg '$other' — pass on/off")
    }
    val bm25Broadcast: Option[Boolean] = args.lift(5) match {
      case None | Some("auto") => None
      case Some("lit") => Some(false)
      case Some("bcast") => Some(true)
      case Some(other) => sys.error(
        s"ChainThroughput: unrecognized bm25mode '$other' — auto/lit/bcast")
    }
    val spark = graft.DriverSession.build(defaultCpus = "32")
    import spark.implicits._

    val tA = System.nanoTime()
    val authorized = graft.operators.Graph.domainAuthority(spark, artifactDir)
      .collect().map(_.getString(0)).toSeq
    val langidW =
      graft.operators.TextAnalysis.trainLangidWeights(spark, artifactDir, 8)
    val scoreW =
      graft.operators.TextAnalysis.trainScoreWeights(spark, artifactDir, 8)
    val lm = graft.operators.TextAnalysis.perplexityLmArtifact(spark, artifactDir)
    // classic five-artifact build cost, comparable across screens modes
    val artifactSec = (System.nanoTime() - tA) / 1e9
    // the three screen artifacts (only built when screens=on), via the
    // ONE shared derivation the parity spec certifies
    // ([[DocsStream.screenArtifacts]] — survivor-quartile thresholds).
    // Timed as its OWN field: the survivor chain pass + quartile
    // derivation would otherwise make artifact_sec incomparable between
    // screens=on and screens=off runs of the same corpus.
    val tS = System.nanoTime()
    val (deconUrls, dsirScreen, bm25Screen) = if (!screens)
      (Seq.empty[String], None, None)
    else {
      val survivors = DocsStream.c4Chain(
          graft.sources.Tables.loadParallel(spark, artifactDir, "documents")
            .withColumn("url",
              graft.operators.TextAnalysis.urlPlant(col("doc_id"))),
          authorized, langidW, keep, scoreW, lm)
        .select("doc_id").as[Long].collect().toSet
      val (urls, d, b) =
        DocsStream.screenArtifacts(spark, artifactDir, survivors)
      (urls, Some(d), Some(b.copy(broadcast = bm25Broadcast)))
    }
    val screenArtifactSec = if (screens) (System.nanoTime() - tS) / 1e9 else 0.0

    // the synthetic corpus carries no url column — derive it in the
    // corpus ADAPTER (the tx_url family's urlPlant device), outside the
    // deployment-shaped chain
    def withUrl(df: DataFrame): DataFrame =
      df.withColumn("url", graft.operators.TextAnalysis.urlPlant(col("doc_id")))
    def chain(df: DataFrame): DataFrame =
      DocsStream.c4Chain(df, authorized, langidW, keep, scoreW, lm,
        deconUrls, dsirScreen, bm25Screen)

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
      s""""screens":$screens,""" +
      s""""bm25_broadcast":${bm25Screen.map(_.useBroadcast).getOrElse(false)},""" +
      s""""chain_sec":${times.min},"chain_all":[${times.mkString(",")}],""" +
      s""""docs_per_sec":$docsPerSec,"us_per_row":$usPerRow,""" +
      s""""artifact_sec":$artifactSec,""" +
      s""""screen_artifact_sec":$screenArtifactSec,"artifact_census":{""" +
      s""""authority_domains":${authorized.size},""" +
      s""""langid_rows":${langidW.size},""" +
      s""""langid_dims":${langidW.headOption.map(_._2.size).getOrElse(0)},""" +
      s""""score_dims":${scoreW.size},""" +
      s""""lm_bigrams":${lm.seen.size},"lm_unigrams":${lm.c1.size},""" +
      s""""decon_urls":${deconUrls.size},""" +
      s""""dsir_buckets":${dsirScreen.map(_.weights.wt.size).getOrElse(0)},""" +
      s""""bm25_queries":${bm25Screen.map(_.queries.size).getOrElse(0)}},""" +
      s""""keep":"${keep.toSeq.sorted.mkString(",")}"}""")
    spark.stop()
  }
}
