package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Clustering, Similarity}
import graft.sources.Tables

/** The streaming→index lifecycle ([[StreamIndexIngest]]): a multi-epoch
  * streamed ingest through [[EmbStream.embChain]] lands the SAME index a
  * batch build-and-append produces over the same vectors (search
  * parity), and the epoch-ledger / duplicate / drift guards each fire
  * the way the production story needs them to.
  */
class IndexIngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def divRow(id: Long): EmbStream.DivGate =
    EmbStream.DivGate(id, 0, admitted = true, None, None, 0.0, 1,
      retained = true)

  test("stream ingest: multi-epoch equals batch-built-and-appended; ledger, duplicate and drift guards fire") {
    val emb = Tables.loadParallel(spark, dir, "embeddings")
      .select("vec_id", "embedding").filter(col("embedding").isNotNull)
    val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 0L)
    val deltaRows = emb.filter(pmod(col("vec_id"), lit(5L)) === 0L)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    assert(deltaRows.size >= 9, "need a real delta slice")
    val cents = Clustering.initCentroids(base, 10)
    val pathsA = Similarity.writeIvfPqIndexShards(spark, base, tmp("gii-a"), 2)
    val ledger = tmp("gii-ledger")
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[StreamIndexIngest.IngestReport]

    // three epochs through the REAL chain into the real sink
    val in = MemoryStream[(Long, Seq[Float])](spark)
    val q = EmbStream.embChain(in.toDF().toDF("vec_id", "embedding"), cents)
      .writeStream
      .foreachBatch(StreamIndexIngest.sink(pathsA, ledger, emb,
        onReport = r => reports.synchronized { reports += r }) _)
      .start()
    try {
      deltaRows.grouped((deltaRows.size + 2) / 3).foreach { chunk =>
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val live = reports.filter(!_.skipped)
    assert(live.size == 3, s"expected 3 committed epochs, got $reports")
    assert(live.forall(r => (0L to 2L).contains(r.epochId)))
    assert(live.map(_.nDelta).sum > 0, "the chain must admit something")
    assert(live.flatMap(_.decisions).forall(!_._2),
      "same-distribution epochs must append, not retrain")

    // batch twin: identical (deterministic) base build, then ONE
    // append of exactly the ids the stream landed
    val baseIds = base.select("vec_id").as[Long].collect().toSet
    val streamedIds = pathsA.flatMap(p =>
      spark.read.parquet(s"$p/codes").select("vec_id").as[Long].collect())
      .toSet -- baseIds
    assert(streamedIds.nonEmpty && live.map(_.nDelta).sum ==
      streamedIds.size.toLong, "every offered vector landed exactly once")
    val pathsB = Similarity.writeIvfPqIndexShards(spark, base, tmp("gii-b"), 2)
    Similarity.appendOrRetrainSharded(spark, pathsB,
      emb.filter(col("vec_id").isin(streamedIds.toSeq: _*)), emb)
    val probes = emb.filter(col("vec_id") < 8)
    val a = Similarity.searchIvfPqIndexSharded(spark, pathsA, probes)
      .collect().map(_.toSeq).toSeq
    val b = Similarity.searchIvfPqIndexSharded(spark, pathsB, probes)
      .collect().map(_.toSeq).toSeq
    assert(a == b,
      "per-epoch streamed ingest must search identically to the batch twin")

    // LEDGER: redelivering a committed epoch is a logged no-op
    val someId = streamedIds.head
    val replay = StreamIndexIngest.ingestEpoch(
      Seq(divRow(someId)).toDS(), 0L, pathsA, ledger, emb)
    assert(replay.skipped && replay.nDelta == 0L)

    // DUPLICATE guard: a fresh epoch carrying an already-indexed id
    // refuses loudly (no silent double-append), and the ledger does NOT
    // mark the failed epoch
    val dup = intercept[IllegalArgumentException] {
      StreamIndexIngest.ingestEpoch(
        Seq(divRow(someId)).toDS(), 999L, pathsA, ledger, emb)
    }
    assert(dup.getMessage.contains("Deduplicate the delta"), dup.getMessage)
    assert(!StreamIndexIngest.committed(spark, ledger, 999L),
      "a failed epoch must stay uncommitted")
    // RECOVERY: the same epoch with screenExisting reconciles to a
    // no-op commit
    val rec = StreamIndexIngest.ingestEpoch(
      Seq(divRow(someId)).toDS(), 999L, pathsA, ledger, emb,
      screenExisting = true)
    assert(!rec.skipped && rec.nDelta == 0L &&
      StreamIndexIngest.committed(spark, ledger, 999L))

    // MISSING-PAYLOAD refusal: a survivor id absent from the corpus
    // table must refuse loudly, not silently drop — and must NOT mark
    // the epoch committed
    val ghost = emb.agg(max(col("vec_id"))).first().getLong(0) + 500L
    val miss = intercept[IllegalArgumentException] {
      StreamIndexIngest.ingestEpoch(
        Seq(divRow(ghost)).toDS(), 998L, pathsA, ledger, emb)
    }
    assert(miss.getMessage.contains("out of sync"), miss.getMessage)
    assert(!StreamIndexIngest.committed(spark, ledger, 998L))

    // DRIFT guard: an impossible ratio bound forces the retrain path on
    // the routed shard (run LAST — it reshapes pathsA's codebooks).
    // The retrain source is the index's CURRENT MEMBERSHIP ∪ the
    // epoch's delta — not the whole corpus table — so the rebuilt shard
    // holds exactly one more row and later epochs' appends cannot
    // collide with vectors they never ingested.
    val codesBefore = pathsA.map(p =>
      spark.read.parquet(s"$p/codes").count()).sum
    val freshId = emb.agg(max(col("vec_id"))).first().getLong(0) + 1L
    val freshVec = emb.limit(1).collect()(0).getSeq[Float](1)
    val embPlus = emb.unionAll(
      Seq((freshId, freshVec), (freshId + 1L, freshVec))
        .toDF("vec_id", "embedding"))
    val drift = StreamIndexIngest.ingestEpoch(
      Seq(divRow(freshId)).toDS(), 1000L, pathsA, ledger, embPlus,
      maxErrRatio = 1e-12)
    assert(drift.nDelta == 1L && drift.decisions.nonEmpty &&
      drift.decisions.forall(_._2),
      s"the drift guard must retrain the routed shard: $drift")
    val codesAfter = pathsA.map(p =>
      spark.read.parquet(s"$p/codes").count()).sum
    assert(codesAfter == codesBefore + 1,
      s"retrain must rebuild membership ∪ delta exactly: " +
        s"$codesBefore -> $codesAfter")
    // a LATER epoch's new vector still appends cleanly post-retrain
    // (the corpus-as-retrain-source bug would have pre-indexed it and
    // tripped the duplicate refusal here)
    val after = StreamIndexIngest.ingestEpoch(
      Seq(divRow(freshId + 1L)).toDS(), 1001L, pathsA, ledger, embPlus)
    assert(after.nDelta == 1L && after.decisions.forall(!_._2),
      s"post-retrain epoch must append: $after")
  }
}
