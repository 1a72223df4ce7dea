package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Deduplication operators over the `documents` table — the scale path for
  * each avoids any all-pairs comparison: exact dedup is a hash group-by;
  * near-dup families generate candidates by bucket join (LSH bands / SimHash
  * bands / shared shingles) and verify only candidates.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Exact dedup: hash-groupBy on content digest; keep the smallest doc_id.
    * Map-side partial aggregation means only one row per distinct digest
    * crosses the shuffle.
    */
  def dd_exact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("digest")

  /** Bag-of-words fingerprint dedup: md5 of the sorted distinct word set.
    * Catches reorderings/duplicated-word variants that exact dedup misses.
    */
  def dd_fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(concat_ws(" ", array_sort(array_distinct(words(col("text")))))).as("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy("fp")

  /** MinHash+LSH near-dup candidate pairs: shingle → 32-hash signature →
    * 8 bands → explode band keys → self-join on band key → distinct pairs,
    * with the estimated Jaccard (signature agreement) attached.
    * Candidate generation is O(docs × bands); only bucket collisions are
    * verified. Deterministic end to end (xxhash64).
    */
  def dd_minhash(s: SparkSession, dir: String, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    // both sides of the band self-join read the signatures: persist so the
    // shingle+signature pipeline runs once
    val sigs = minhashSignatures(docs(s, dir), k).persist()
    val banded = sigs
      .select(col("doc_id"), col("sig"),
        posexplode(minhashBands(col("sig"), k, bands)))
      .select(col("doc_id"), col("sig"), col("pos").as("band"), col("col").as("bkey"))
    val a = banded.select(col("band"), col("bkey"), col("doc_id").as("a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bkey"), col("doc_id").as("b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
          .cast("double") / k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** MinHash signatures in aggregate form: shingle-hashes exploded to rows,
    * then k `min` aggregates — map-side partial aggregation, whole-stage
    * codegen, no per-family array allocation. (The pure-expression form in
    * [[graft.functions.TextFunctions.minhash]] is algebraically identical but
    * CollapseProject inlines the shingle pipeline into every per-family
    * lambda — a 32× recompute; see the bench history.)
    */
  def minhashSignatures(documents: DataFrame, k: Int): DataFrame = {
    val sh = documents.select(col("doc_id"),
      explode(hashedShingles(col("text"), 3)).as("h"))
    val mins = (0 until k).map(i => min(xxhash64(col("h"), lit(i))).as(s"__m$i"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** SimHash near-dup: 64-bit fingerprints, candidates share one of four
    * 16-bit bands (any pair within Hamming distance 3 must agree on ≥1 band),
    * verified by exact Hamming distance.
    */
  def dd_simhash(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val fps = simhashFingerprints(docs(s, dir)).persist()
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          call_function("shiftright", col("fp"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("fp"), col("bb.band"), col("bb.bkey"))
    val a = banded.select(col("band"), col("bkey"), col("doc_id").as("a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("bkey"), col("doc_id").as("b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  /** SimHash fingerprints in aggregate form (same rationale as
    * [[minhashSignatures]]): one word-hash row per occurrence, 64 signed
    * bit-vote sums, then a static 64-term OR packs the fingerprint.
    * Identical output to [[graft.functions.TextFunctions.simhash64]].
    */
  def simhashFingerprints(documents: DataFrame): DataFrame = {
    val wh = documents
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val votes = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"__v$j"))
    wh.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"__v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("fp"))
  }

  /** Exact n-gram Jaccard near-dup: candidates = pairs sharing ≥1 shingle
    * (inverted-index join on distinct shingles), verified with the exact
    * |A∩B| / |A∪B| computed from co-occurrence counts — no signatures, no
    * all-pairs.
    */
  def dd_ngram_jaccard(s: SparkSession, dir: String, n: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    // join on 64-bit shingle hashes: same pair counts (collisions at 2^-64
    // are below any practical risk), far cheaper shuffle + compare than
    // shingle strings
    val sh = docs(s, dir)
      .select(col("doc_id"), explode(hashedShingles(col("text"), n)).as("sh"))
      .persist() // read by both join sides and the size aggregate
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.select(col("sh"), col("doc_id").as("a"))
      .join(sh.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), Seq("a"))
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  /** Connected components over a near-dup pair graph → duplicate clusters
    * with a canonical (minimum) doc id. Iterative min-label propagation:
    * each round joins labels to edges and takes the per-node minimum —
    * O(diameter) rounds of one shuffle each, the standard scalable CC
    * formulation (no driver-side graph).
    */
  def clusterPairs(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var i = 0
    var cachedPrev: DataFrame = null
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nlabel"))
      // old and new label carried together: the convergence probe reuses the
      // same persisted frame instead of a second join
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("__old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist()
      converged = updated.filter(col("label") =!= col("__old")).isEmpty
      labels = updated.select("id", "label")
      if (cachedPrev != null) cachedPrev.unpersist()
      cachedPrev = updated
      i += 1
    }
    edges.unpersist()
    labels.withColumnRenamed("label", "cluster").orderBy("id")
  }

  /** Near-dup clusters from the MinHash candidate graph. */
  def dd_cluster(s: SparkSession, dir: String): DataFrame =
    clusterPairs(dd_minhash(s, dir).select("a", "b"))

  /** Embedding-cosine near-dup over the embeddings table: the exact all-pairs
    * baseline (a < b halves the space; cosine is the bit-deterministic double
    * fold of [[graft.functions.TextFunctions.cosine]]). The sub-quadratic
    * scale path is the LSH bucketing of [[Similarity.withLshBucket]] /
    * [[Similarity.ann_lsh]].
    */
  def dd_embed_cosine(s: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    import graft.functions.VecDot
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), VecDot.norm(col("embedding")).as("nrm"))
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        VecDot.cosineFast(VecDot.dot(col("ea"), col("eb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("a", "b")
  }
}
