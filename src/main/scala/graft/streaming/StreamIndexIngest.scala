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
  *    at-least-once delivery). The ledger keys on foreachBatch's
  *    `batchId`, which is stable across RESTARTS only when the query
  *    runs with a `checkpointLocation` — a ledger dir may only outlive
  *    a query run when paired with that query's checkpoint (otherwise
  *    a restarted query renumbers batches from 0 and the ledger would
  *    skip genuinely new data as "redelivered"); a checkpoint-free run
  *    must start with a fresh ledger.
  *  - **drift guard**: each epoch's delta is priced per shard against
  *    the health sidecar ([[graft.operators.Similarity.appendOrRetrain]]
  *    — append under `maxErrRatio`, retrain the drifted shard from
  *    `vecs` otherwise), so a stream that wanders off the trained
  *    distribution retrains exactly the shards it aged, not the fleet.
  *
  * `vecs` is the raw vector corpus kept beside the index (the
  * appendOrRetrain contract — an index holds only codes): the PAYLOAD
  * LOOKUP for the chain's payload-free decisions. It is NOT used as
  * the retrain source directly — the retrain source is derived per
  * epoch as (current index membership ∪ this epoch's delta), see
  * [[ingestEpoch]]. Scale shape: per epoch, one |epoch|-sized id join
  * against the corpus table, one vec_id-only codes scan, and
  * O(|delta|) append work; the ledger is one file-existence probe.
  * Nothing here holds streaming state — the chain's stores carry the
  * dedup/diversity memory, the index carries the codes, the ledger
  * carries the commit frontier.
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
    *
    * Two correctness edges a naive spelling gets wrong, both refused or
    * derived here rather than documented away:
    *  - a survivor id MISSING from `vecs` refuses loudly (an inner
    *    payload join would silently drop it, commit the marker, and
    *    lose the vector forever — stream/corpus-snapshot skew is
    *    exactly when that happens);
    *  - a drift-triggered RETRAIN must rebuild the shard from exactly
    *    the index's CURRENT MEMBERSHIP plus this epoch's delta — never
    *    from the whole `vecs` table, which also holds future epochs'
    *    not-yet-ingested vectors (their later append would then trip
    *    the duplicate refusal mid-stream) and, under `retainedOnly`,
    *    every non-retained vector (the "coreset" shard would silently
    *    stop being the coreset). The membership id set is one
    *    vec_id-only codes scan per epoch.
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
    // membership ids are CHECKPOINTED (one id-column materialization per
    // epoch): the retrain path hands `allVecs` — which derives from this
    // frame — to writeIvfPqIndexFrom, and that OVERWRITES codes/; a
    // lazy plan would then read codes/ while deleting it (self-overwrite
    // → FILE_NOT_EXIST mid-retrain). The checkpoint pins the membership
    // snapshot before any write can touch the files it came from.
    import graft.Checkpoints.DatasetCheckpointOps
    val memberIds = paths
      .map(p => s.read.parquet(s"$p/codes").select("vec_id"))
      .reduce(_ unionAll _).graftCheckpoint()
    val ids = keep.select("vec_id").distinct()
    val deltaIds =
      if (!screenExisting) ids
      else ids.join(memberIds, Seq("vec_id"), "left_anti")
    val nDelta = deltaIds.count()
    // an empty epoch (nothing retained, or everything screened) commits
    // without touching the index — appendOrRetrainSharded rightly
    // refuses an empty delta, and a quiet stream tick is not an error
    if (nDelta == 0L) {
      markCommitted(s, ledgerDir, epochId)
      return IngestReport(epochId, skipped = false, 0L, Seq.empty)
    }
    // retrain source: current membership ∪ this epoch's delta, payloads
    // from the corpus table — with loud coverage refusal (see above)
    val wantIds = memberIds.unionAll(deltaIds).distinct()
    val nWant = wantIds.count()
    val allVecs = vecs.join(wantIds, Seq("vec_id"))
    val nHave = allVecs.count()
    require(nHave == nWant,
      s"ingestEpoch: epoch $epochId needs $nWant vectors (index members " +
        s"+ this epoch's survivors) but the corpus table supplies only " +
        s"$nHave — the stream and the corpus snapshot are out of sync; " +
        "refusing rather than silently dropping survivors or retraining " +
        "a shard without its members")
    val delta = vecs.join(deltaIds, Seq("vec_id"))
    val decisions = Similarity.appendOrRetrainSharded(s, paths, delta,
      allVecs, maxErrRatio, retrainIters)
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
