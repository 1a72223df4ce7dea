package graft.operators

import org.apache.spark.sql.functions._

/** Break-even evidence for the sharded maintenance decision (SURVEY
  * §8.5's honest note): at 20 k vectors the sharded pricing pass costs
  * MORE than just rebuilding one index from scratch — four shards × fixed
  * per-job overhead dominates. The operator's claim is asymptotic: the
  * decision tick is O(|delta|) + fixed overhead while a rebuild re-trains
  * and re-encodes O(|corpus|), so the lines must cross. This main
  * MEASURES the crossover instead of asserting it: for each factor it
  * stages a factor×2000-vector corpus ([[graft.Replicate.replicated]],
  * jittered ids+values), deploys `shards` shards, then times the two
  * alternatives a production tick actually chooses between on the SAME
  * fixed-size no-drift delta (one more 2000-vector copy):
  *
  *  - `decision_sec` — [[Similarity.appendOrRetrainSharded]]: price every
  *    shard's slice, all appends (no drift planted, err_ratio ≈ 1).
  *  - `rebuild_sec` — [[Similarity.writeIvfPqIndexFrom]] over
  *    corpus+delta into a fresh path (what "skip the pricing machinery
  *    and rebuild each tick" costs).
  *
  * Prints one JSON line per factor. Usage: `tools/run.sh
  * graft.operators.ShardedCrossoverBench [embDir] [factors] [shards]`
  * (defaults sf0.1, `10,50,100,250,500`, 4).
  */
object ShardedCrossoverBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("10,50,100,250,500")
      .split(",").toSeq.map(_.trim.toInt)
    val shards = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = graft.DriverSession.build(defaultCpus = "32")
    val base = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")

    for (f <- factors) {
      // stage corpus and delta as parquet once, so both alternatives read
      // the same materialized input (a lazy replica would re-run the
      // jitter transform inside every kmeans iteration of the rebuild,
      // charging it staging cost the decision path never pays)
      val scratch = graft.sources.Tables.scratchDir("graftxover", s"$dir|$f")
      graft.Replicate.replicated(base, "embeddings", f)
        .write.mode("overwrite").parquet(s"$scratch/corpus.parquet")
      graft.Replicate.copySlice(base, "embeddings", f.toLong)
        .write.mode("overwrite").parquet(s"$scratch/delta.parquet")
      val corpus = spark.read.parquet(s"$scratch/corpus.parquet")
      val delta = spark.read.parquet(s"$scratch/delta.parquet")
      val all = corpus.unionByName(delta)
      val n = corpus.count()

      val t0 = System.nanoTime()
      val paths = Similarity.writeIvfPqIndexShards(
        spark, corpus, s"$scratch/deploy", shards)
      val buildSec = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val decisions = Similarity.appendOrRetrainSharded(spark, paths, delta, all)
      val decisionSec = (System.nanoTime() - t1) / 1e9
      val retrains = decisions.count(_._2)

      val t2 = System.nanoTime()
      Similarity.writeIvfPqIndexFrom(spark, all, s"$scratch/rebuilt")
      val rebuildSec = (System.nanoTime() - t2) / 1e9

      println(s"""{"metric":"sharded_crossover","factor":$f,"vectors":$n,""" +
        s""""delta":${delta.count()},"shards":$shards,""" +
        s""""deploy_build_sec":$buildSec,"decision_sec":$decisionSec,""" +
        s""""rebuild_sec":$rebuildSec,"retrains":$retrains}""")
    }
    spark.stop()
  }
}
