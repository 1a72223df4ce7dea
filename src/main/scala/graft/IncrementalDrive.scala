package graft

import graft.operators.Dedup

/** Adversarial-gate drive for the PERSISTED-STORE incremental dedup path
  * (`tools/check_incremental_adversarial.py`): builds the signature store
  * from a PRIOR snapshot, classifies a LATER snapshot's delta against it
  * with the broadcast-Bloom digest screen on and off, and reports the
  * screen's observe() stats so the gate can prove that Bloom FALSE
  * POSITIVES actually exercised the join-confirm path (the shipped
  * corpora's handful of probes never statistically produce one, so the
  * "every positive is still confirmed by the join" half of the contract
  * is otherwise certified only by code reading).
  *
  * Usage: graft.IncrementalDrive <storeSnapshotDir> <deltaSnapshotDir>
  *        <outDir> [extraThreshold]
  *   - writes the store to  <outDir>/store
  *   - bloom-on verdicts to <outDir>/on, bloom-off to <outDir>/off
  *   - with extraThreshold: also <outDir>/on_x and <outDir>/off_x at that
  *     threshold against the SAME store (signatures are threshold-free —
  *     the gate exercises that reuse too; the default t=0.4 never sits on
  *     an IEEE ceiling boundary at plantable sizes, t=0.55 does)
  *   - prints one JSON line {"probes_total":N,"probes_passed":M}
  *     (the default-threshold bloom-on run's screen stats)
  */
object IncrementalDrive {
  def main(args: Array[String]): Unit = {
    val (snapA, snapB, outDir, extraT) = args match {
      case Array(a, b, o)    => (a, b, o, None)
      case Array(a, b, o, t) => (a, b, o, Some(t.toDouble))
      case _ =>
        System.err.println("usage: graft.IncrementalDrive " +
          "<storeSnapshotDir> <deltaSnapshotDir> <outDir> [extraThreshold]")
        sys.exit(2)
    }
    val spark = DriverSession.build(defaultCpus = "8")
    val store = s"$outDir/store"
    Dedup.writeCorpusSignatures(spark, snapA, store)
    Dedup.dd_incremental_stored(spark, snapB, store)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/on")
    // the screen's observe() fired on the eager exact-path barrier inside
    // the call above; read it before the bloom-off run (which never sets it)
    val (total, passed) = Dedup.lastBloomScreenStats.getOrElse((-1L, -1L))
    Dedup.dd_incremental_stored(spark, snapB, store, useBloom = false)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/off")
    extraT.foreach { t =>
      Dedup.dd_incremental_stored(spark, snapB, store, threshold = t)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/on_x")
      Dedup.dd_incremental_stored(spark, snapB, store, threshold = t,
          useBloom = false)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/off_x")
    }
    println(s"""{"probes_total":$total,"probes_passed":$passed}""")
    spark.stop()
  }
}
