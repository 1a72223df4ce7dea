package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The streaming→index LIFECYCLE composition — the piece between the
  * embeddings ingest chain ([[EmbStream.embChain]]: semantic dedup →
  * diversity) and the persisted sharded IVF×PQ deployment
  * ([[graft.operators.Similarity.appendOrRetrainSharded]]): per
  * micro-batch epoch, fetch the surviving arrivals' vectors and run the
  * drift-gated append-or-retrain against every routed shard. This is
  * the production vector-ingest story the two ends were built for —
  * the chain's decisions are payload-free, the index's appends are
  * drift-priced, and this sink is the `foreachBatch` glue that keeps
  * BOTH contracts:
  *
  *  - **duplicate-batch guard**: Structured Streaming redelivers a
  *    micro-batch after a failure (at-least-once `foreachBatch`); a
  *    blind re-append would trip the index's loud duplicate-vec_id
  *    refusal mid-recovery. An epoch LEDGER (one marker file per
  *    committed epoch under `ledgerDir`) makes redelivery a logged
  *    no-op. The marker lands AFTER the appends — a crash between
  *    append and marker leaves the redelivered epoch to the index's own
  *    duplicate guard, which refuses loudly rather than double-append
  *    (recover by re-running the epoch with `screenExisting = true`,
  *    which anti-joins the delta against the codes already landed —
  *    exactly-once by reconciliation, the only honest recovery under
  *    at-least-once delivery).
  *  - **drift guard**: each epoch's delta is priced per shard against
  *    the health sidecar ([[graft.operators.Similarity.appendOrRetrain]]
  *    — append under `maxErrRatio`, retrain the drifted shard from
  *    `vecs` otherwise), so a stream that wanders off the trained
  *    distribution retrains exactly the shards it aged, not the fleet.
  *
  * `vecs` is the raw vector corpus kept beside the index (the
  * appendOrRetrain contract — an index holds only codes): the payload
  * lookup for the chain's payload-free decisions AND the retrain
  * source. Scale shape: per epoch, one |epoch|-sized id join against
  * the corpus table plus O(|delta|) append work; the ledger is one
  * file-existence probe. Nothing here holds streaming state — the
  * chain's stores carry the dedup/diversity memory, the index carries
  * the codes, the ledger carries the commit frontier.
  */
object StreamIndexIngest {

  /** One epoch's outcome, for logs/specs: `skipped` = ledger hit,
    * `nDelta` = vectors actually offered to the index this epoch,
    * `decisions` = appendOrRetrainSharded's per-shard (shard, retrained,
    * errRatio) log (empty when the epoch carried nothing).
    */
  final case class IngestReport(epochId: Long, skipped: Boolean,
      nDelta: Long, decisions: Seq[(Int, Boolean, Double)])

  private def markerPath(ledgerDir: String, epochId: Long) =
    new org.apache.hadoop.fs.Path(ledgerDir, s"epoch_$epochId")

  /** Has `epochId` already committed? (The redelivery probe.) */
  def committed(s: org.apache.spark.sql.SparkSession, ledgerDir: String,
      epochId: Long): Boolean = {
    val m = markerPath(ledgerDir, epochId)
    m.getFileSystem(s.sparkContext.hadoopConfiguration).exists(m)
  }

  private def markCommitted(s: org.apache.spark.sql.SparkSession,
      ledgerDir: String, epochId: Long): Unit = {
    val m = markerPath(ledgerDir, epochId)
    val fs = m.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(m.getParent)
    // createNewFile returning false means a racer already marked this
    // epoch — committed either way
    fs.createNewFile(m)
    ()
  }

  /** Ingest ONE epoch's chain decisions. Every [[EmbStream.embChain]]
    * output row is a semantic-dedup survivor; `retainedOnly = true`
    * narrows to the diversity sketch's post-cascade members (the
    * coreset deployment — [[EmbStream.DivGate]]'s `retained` contract),
    * false indexes every survivor (the similarity-search deployment).
    * `screenExisting` anti-joins the delta against the codes already in
    * the index — the crash-recovery mode (see the class doc); off by
    * default so a genuinely duplicated id still refuses loudly.
    */
  def ingestEpoch(batch: Dataset[EmbStream.DivGate], epochId: Long,
      paths: Seq[String], ledgerDir: String, vecs: DataFrame,
      retainedOnly: Boolean = false, screenExisting: Boolean = false,
      maxErrRatio: Double = 2.0, retrainIters: Int = 0): IngestReport = {
    val s = batch.sparkSession
    if (committed(s, ledgerDir, epochId))
      return IngestReport(epochId, skipped = true, 0L, Seq.empty)
    val keep =
      if (retainedOnly) batch.filter(col("retained")) else batch.toDF()
    val delta0 = vecs.join(keep.select("vec_id"), Seq("vec_id"))
    val delta =
      if (!screenExisting) delta0
      else delta0.join(
        paths.map(p => s.read.parquet(s"$p/codes").select("vec_id"))
          .reduce(_ unionAll _),
        Seq("vec_id"), "left_anti")
    val nDelta = delta.count()
    // an empty epoch (nothing retained, or everything screened) commits
    // without touching the index — appendOrRetrainSharded rightly
    // refuses an empty delta, and a quiet stream tick is not an error
    val decisions =
      if (nDelta == 0L) Seq.empty[(Int, Boolean, Double)]
      else Similarity.appendOrRetrainSharded(s, paths, delta, vecs,
        maxErrRatio, retrainIters)
    markCommitted(s, ledgerDir, epochId)
    IngestReport(epochId, skipped = false, nDelta, decisions)
  }

  /** [[ingestEpoch]] shaped for `writeStream.foreachBatch`; per-epoch
    * reports surface through `onReport` (a drive's log line, a spec's
    * buffer) since foreachBatch discards return values.
    */
  def sink(paths: Seq[String], ledgerDir: String, vecs: DataFrame,
      retainedOnly: Boolean = false, screenExisting: Boolean = false,
      maxErrRatio: Double = 2.0, retrainIters: Int = 0,
      onReport: IngestReport => Unit = _ => ())(
      batch: Dataset[EmbStream.DivGate], epochId: Long): Unit =
    onReport(ingestEpoch(batch, epochId, paths, ledgerDir, vecs,
      retainedOnly, screenExisting, maxErrRatio, retrainIters))
}
