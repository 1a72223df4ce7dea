package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Clustering

/** Structured-Streaming twins for the embedding-dedup family — the
  * streaming counterpart of [[graft.operators.Dedup.dd_semdedup]], the way
  * [[DocsStream.nearDupScreen]] twins the MinHash batch operators.
  */
object EmbStream {

  /** One gate decision per arriving vector. `admitted` = no
    * previously-admitted vector in the same quantizer cell was within
    * `threshold` cosine; otherwise `matched_id`/`cos` name the witness.
    * `state_full` marks decisions taken while the cell's state was at
    * capacity — an admitted vector NOT recorded for future comparisons,
    * so downstream can see exactly where recall was traded for bounded
    * state instead of discovering it later (the streaming analogue of
    * [[graft.operators.Dedup.capBucketsLoss]]).
    */
  case class EmbGate(vec_id: Long, cluster: Int, admitted: Boolean,
      matched_id: Option[Long], cos: Option[Double], state_full: Boolean)

  /** Streaming SemDeDup gate: admit a vector unless an already-admitted
    * vector in its cell is within `threshold` cosine.
    *
    * Scale shape, mirroring the batch operator exactly: cells come from
    * the SAME deterministic coarse assignment ([[Clustering.assignTo]] on
    * literal `cents` — pass the persisted IVF index's centroids to share
    * cells with it), so state shards by cell across executors and a new
    * vector compares against its OWN cell only — never the corpus. State
    * per cell is the admitted (vec_id, embedding) list, hard-capped at
    * `stateCap`: a cell that fills keeps admitting (availability over
    * dedup strictness) but flags every such decision `state_full`.
    * Within a batch, a cell's arrivals are processed in vec_id order, so
    * replaying the same batches reproduces the same admissions
    * bit-for-bit.
    *
    * Semantics vs the batch operator — greedy keeper set, NOT identical
    * on similarity chains: the gate compares an arrival against ADMITTED
    * vectors only (a refused vector is never recorded), so every refusal
    * has a KEPT witness. The batch audit flags a vector near ANY lower-id
    * cell member, flagged or not — on a chain v1 ≈ v2 ≈ v3 (v1 !≈ v3)
    * the batch keeps {v1} while the gate keeps {v1, v3}. The gate's set
    * is the right contract for an online filter (everything it dropped
    * is near something it KEPT — batch flagging can drop v3 whose only
    * witness v2 was itself dropped); the divergence is spec-pinned, not
    * accidental.
    */
  def semanticDedupGate(stream: DataFrame, cents: Seq[Seq[Double]],
      threshold: Double = 0.9, stateCap: Int = 10000): Dataset[EmbGate] = {
    import stream.sparkSession.implicits._
    stream
      .select(col("vec_id").cast("long"), col("embedding"),
        Clustering.assignTo(cents).getField("c").as("cluster"))
      .as[(Long, Seq[Float], Int)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (cell: Int, rows: Iterator[(Long, Seq[Float], Int)],
            state: GroupState[List[(Long, Seq[Float])]]) => {
          var admitted = state.getOption.getOrElse(Nil)
          var n = admitted.size
          val out = rows.toSeq.sortBy(_._1).map { case (id, vec, _) =>
            val witness = admitted.iterator
              .map { case (aid, avec) => (aid, cosine(vec, avec)) }
              .find(_._2 >= threshold)
            witness match {
              case Some((aid, c)) =>
                EmbGate(id, cell, admitted = false, Some(aid), Some(c), n >= stateCap)
              case None =>
                val full = n >= stateCap
                if (!full) { admitted = (id, vec) :: admitted; n += 1 }
                EmbGate(id, cell, admitted = true, None, None, full)
            }
          }
          state.update(admitted)
          out.iterator
        })
  }

  /** Plain-Scala cosine over float vectors — double accumulation, the same
    * operation order as [[graft.functions.VecDot]]'s fast path.
    */
  private[streaming] def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val len = math.min(a.length, b.length)
    while (i < len) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The persisted IVF index's coarse centroids ([[
    * graft.operators.Similarity.writeIvfPqIndex]] layout), for gating a
    * stream on the SAME cells a batch index serves — KBs, loaded
    * driver-side once through the index's own sidecar decoder.
    */
  def centroidsOf(s: SparkSession, indexPath: String): Seq[Seq[Double]] =
    graft.operators.Similarity.loadCentroids(s, indexPath)
}
