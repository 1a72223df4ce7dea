package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composition-cost drive for [[graft.streaming.DocsStream.c4Chain]] —
  * times each gate ALONE on the base table, then the barriered chain,
  * so the §8.5 claim "chain ≈ Σ stages" stays measurable. This drive is
  * how the observe-barrier necessity was established: composed WITHOUT
  * the CollectMetrics boundaries, any prefix containing langid-on-
  * extract read ~200 s at sf0.1 (PushPredicateThroughNonJoin substitutes
  * each stage's fold — with the whole upstream extract tree inlined —
  * into the pushed filter and re-evaluates it per row at the scan); the
  * barriered chain reads ~7 s, the stage sum.
  *
  * Usage: `tools/run.sh graft.ChainProbe [dir] [explain]`.
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = DriverSession.build(defaultCpus = "32")
    val S = graft.streaming.DocsStream
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .withColumn("url", graft.operators.TextAnalysis.urlPlant(col("doc_id")))
    val authorized = graft.operators.Graph.domainAuthority(spark, dir)
      .collect().map(_.getString(0)).toSeq
    val w = graft.operators.TextAnalysis.trainLangidWeights(spark, dir, 8)
    val sw = graft.operators.TextAnalysis.trainScoreWeights(spark, dir, 8)
    val lm = graft.operators.TextAnalysis.perplexityLmArtifact(spark, dir)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
      "extract" -> (d => S.extractGate(d)),
      "url" -> (d => S.urlGate(d)),
      "auth" -> (d => S.authorityGate(d, authorized)),
      "langid" -> (d => S.langidGate(d, w, Set("en", "zh"))),
      "score" -> (d => S.scoreGate(d, sw)),
      "pplx" -> (d => S.perplexityGate(d, lm)))
    // each stage alone on the base table
    for ((name, f) <- stages) t(s"alone_$name") { f(docs).count() }
    // the barriered composition (c4Chain's observe boundaries)
    t("c4chain_rep1") {
      S.c4Chain(docs, authorized, w, Set("en", "zh"), sw, lm).count()
    }
    t("c4chain_rep2") {
      S.c4Chain(docs, authorized, w, Set("en", "zh"), sw, lm).count()
    }
    args.lift(1).foreach { _ =>
      S.c4Chain(docs, authorized, w, Set("en", "zh"), sw, lm)
        .explain("formatted")
    }
    spark.stop()
  }
}
