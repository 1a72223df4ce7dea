package graft.operators

/** Break-even evidence for the two [[Clustering.samp_kcenter]] spellings
  * (the scaladoc's claim, measured instead of asserted): the façade
  * re-minimizes every point against the WHOLE selected set each round —
  * O(n·k²) distance work, zero per-round materialization — while
  * [[Clustering.samp_kcenter_fast]] persists a per-point running min —
  * O(n·k) distance work at one lineage-cut materialization per round.
  * At façade k the checkpoint overhead dominates and the simple shape
  * wins; as k grows the quadratic distance term must cross it. This main
  * measures all THREE spellings at a ladder of k on the same corpus and
  * prints one JSON line per rung: `facade_sec`/`fast_sec` are the exact
  * pair (bit-identical frames, asserted per rung before their timings
  * are trusted); `sharded_sec` is [[Clustering.samp_kcenter_sharded]]'s
  * composable-coreset APPROXIMATION (no parity to assert — different
  * selection by design) with fixed kPrime and shards sized so the
  * coreset can seat k, timed warm.
  *
  * Usage: `tools/run.sh graft.operators.KcenterCrossoverBench [embDir]
  * [ks]` (defaults sf0.1, `8,16,32,64`).
  */
object KcenterCrossoverBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("8,16,32,64")
      .split(",").toSeq.map(_.trim.toInt)
    val spark = graft.DriverSession.build(defaultCpus = "32")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (k <- ks) {
      val facade = Clustering.samp_kcenter(spark, dir, k).collect().toSeq
      val fast = Clustering.samp_kcenter_fast(spark, dir, k).collect().toSeq
      require(facade == fast,
        s"kcenter crossover: spellings diverge at k=$k — timing a wrong " +
          "answer is meaningless")
      val tFacade = time(Clustering.samp_kcenter(spark, dir, k).collect())
      val tFast = time(Clustering.samp_kcenter_fast(spark, dir, k).collect())
      // the coreset spelling is an approximation (no parity check): fixed
      // kPrime=4 per-shard rounds, shards sized so the coreset can seat k
      val sh = math.max(Clustering.kcenterShards,
        (k + Clustering.kcenterKPrime - 1) / Clustering.kcenterKPrime)
      Clustering.samp_kcenter_sharded(spark, dir, k,
        Clustering.kcenterKPrime, sh).collect() // warm
      val tSharded = time(Clustering.samp_kcenter_sharded(spark, dir, k,
        Clustering.kcenterKPrime, sh).collect())
      println(s"""{"metric":"kcenter_crossover","k":$k,""" +
        s""""facade_sec":$tFacade,"fast_sec":$tFast,""" +
        s""""sharded_sec":$tSharded,"sharded_shards":$sh}""")
    }
    spark.stop()
  }
}
