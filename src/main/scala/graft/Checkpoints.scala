package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Dataset

/** One switch between fast-but-lossy and reliable materialization barriers.
  *
  * Every multi-consumer / iterative frame in the library (signature groups,
  * label-propagation rounds, PQ codebooks, pack assignments, the rule-engine
  * temp tables) is cut from its lineage with a checkpoint rather than
  * `persist` — blocks are released by the ContextCleaner when the frame is
  * dropped instead of pinning CacheManager memory for the session. The
  * DEFAULT barrier is `localCheckpoint`: executor-local blocks, no
  * distributed filesystem needed, right for local runs and benchmarks. Its
  * known cost is fault-tolerance — lose an executor and the blocks (and the
  * truncated lineage needed to rebuild them) are gone, failing the job.
  *
  * On a real cluster, set ONE conf key:
  *
  * {{{ spark.conf.set(Checkpoints.DirKey, "hdfs:///tmp/graft-ckpt") }}}
  *
  * and every barrier in the library becomes a reliable `checkpoint()`
  * against that directory: executor loss re-reads the checkpoint files, a
  * 1000-executor week-long dedup run survives preemption. The directory is
  * registered with the SparkContext on first use (once per (app, dir) —
  * `setCheckpointDir` mints a fresh UUID subdir per call, so re-registering
  * per barrier would scatter files). Set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to have the
  * ContextCleaner delete reliable checkpoint files when frames are
  * collected, mirroring the local behavior; otherwise clean the directory
  * after the run.
  */
object Checkpoints {

  /** Runtime conf key: when set (non-empty), barriers are reliable
    * `checkpoint()`s into this directory; when unset, `localCheckpoint`.
    */
  val DirKey = "graft.checkpoint.dir"

  // last directory registered per application — setCheckpointDir appends a
  // random UUID segment, so SparkContext.getCheckpointDir never equals the
  // raw conf value and can't serve as the idempotence check
  private val registered = new ConcurrentHashMap[String, String]()

  /** `ds.localCheckpoint(eager)`, or `ds.checkpoint(eager)` into
    * [[DirKey]]'s directory when configured. Semantics match: lineage
    * truncated, result deterministic-identical either way.
    *
    * Cost note for reliable mode: an RDD checkpoint recomputes its subtree
    * to write the files (Spark's documented behavior without a persist), so
    * EAGER barriers cache the frame for the duration of the checkpoint and
    * release it after — one compute, not two, PROVIDED the Dataset's
    * physical plan hasn't been forced before the barrier. A frame the
    * caller already ran an action on has its RDD materialized without the
    * cache in its lineage, so the checkpoint write recomputes that subtree
    * once despite the persist (correctness unaffected; the library's own
    * call sites barrier before any action). A LAZY barrier checkpoints
    * during its first action, where no unpersist hook exists; it pays the
    * one extra subtree compute at that first action only.
    */
  def barrier[T](ds: Dataset[T], eager: Boolean): Dataset[T] =
    barrier(ds, eager, parallel = false)

  /** [[barrier]] with an optional PARALLELISM FLOOR for the checkpointed
    * frame (opt-in per call site, `parallel = true`).
    *
    * Why: AQE coalesces small shuffles by BYTES (advisoryPartitionSizeInBytes
    * / minPartitionSize), blind to the per-row CPU cost of the consumers. A
    * KB-scale signature/state frame coalesces to ONE partition, the eager
    * checkpoint pins that layout, and every downstream compute-heavy stage —
    * shingle explodes into posting lists, per-round distance maps, sorted-
    * overlap verification — then runs single-task while 31 cores idle
    * (measured: dd_incremental's base-signature df derivation 1.69 s on one
    * task; the round-19 optimization pass). With the floor, an eagerly
    * materialized barrier whose partition count landed below
    * `defaultParallelism` is re-partitioned (round-robin) and re-barriered,
    * so ALL consumers read a parallel layout with no per-consumer exchange.
    *
    * Scale behavior: at real data sizes the checkpointed frame already has
    * ≥ defaultParallelism partitions and the floor is a no-op — it can only
    * fire on frames small enough that the extra repartition job is
    * milliseconds. When the floor fires, the FIRST barrier's materialized
    * blocks (or, in reliable mode, its checkpoint files) are abandoned
    * without an explicit release and linger until the ContextCleaner
    * collects the orphaned plan — a deliberate double-materialization cost,
    * acceptable exactly because the floor can only fire on sub-parallelism
    * (KB-scale) frames; a reliable-mode deployment that checkpoints large
    * frames through this path should clean the intermediate directory
    * itself. Only meaningful for EAGER barriers (the partition count
    * of a lazy barrier is unknown until first action); lazy callers keep
    * the plain barrier. Row order within partitions changes (round-robin),
    * which every consumer must already tolerate — checkpointed frames are
    * consumed by joins/aggregates/windows with explicit keys or orderings.
    */
  def barrier[T](ds: Dataset[T], eager: Boolean, parallel: Boolean): Dataset[T] = {
    val ck = barrierRaw(ds, eager)
    if (parallel && eager) {
      val target = ds.sparkSession.sparkContext.defaultParallelism
      // .rdd on an eagerly checkpointed frame reads materialized blocks —
      // no recompute; the count is the checkpoint's real layout
      if (ck.rdd.getNumPartitions < target)
        barrierRaw(ck.repartition(target), eager = true)
      else ck
    } else ck
  }

  private def barrierRaw[T](ds: Dataset[T], eager: Boolean): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // compute() is atomic per key: concurrent first-use barriers block
        // until the directory is registered (a bare put would let the loser
        // race into checkpoint() before setCheckpointDir ran), and a
        // registration failure leaves the mapping unchanged so the next
        // barrier retries instead of inheriting a poisoned entry
        registered.compute(sc.applicationId, (_, prev) => {
          if (prev != dir) sc.setCheckpointDir(dir)
          dir
        })
        if (eager) {
          // already cached by the caller (or a shared plan): checkpoint
          // reads the existing cache; unpersisting here would destroy a
          // cache the caller still owns
          if (ds.storageLevel != org.apache.spark.storage.StorageLevel.NONE) {
            ds.checkpoint(true)
          } else {
            val cached = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try cached.checkpoint(true)
            finally cached.unpersist()
          }
        } else ds.checkpoint(false)
      case None =>
        ds.localCheckpoint(eager)
    }
  }

  /** `.graftCheckpoint()` in place of `.localCheckpoint()` everywhere the
    * library cuts lineage, keeping call sites fluent.
    */
  implicit class DatasetCheckpointOps[T](private val ds: Dataset[T]) extends AnyVal {
    def graftCheckpoint(eager: Boolean = true, parallel: Boolean = false): Dataset[T] =
      barrier(ds, eager, parallel)
  }
}
