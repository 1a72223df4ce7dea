package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints.DatasetCheckpointOps
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Deduplication operators over the `documents` table — the scale path for
  * each avoids any all-pairs comparison: exact dedup is a hash group-by;
  * near-dup families generate candidates by bucket join (LSH bands / SimHash
  * bands / shared shingles) and verify only candidates.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")

  /** Exact dedup: hash-groupBy on content digest; keep the smallest doc_id.
    * Map-side partial aggregation means only one row per distinct digest
    * crosses the shuffle.
    */
  def dd_exact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // null text carries no content to be a copy OF: md5(null)=null and
      // groupBy would collapse every null-text doc into one "duplicate"
      // group whose keeper map then drops unrelated documents. Same
      // exclusion in the DuckDB twin.
      .filter(col("text").isNotNull)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("digest")

  /** Exact dedup with a QUALITY-AWARE keeper: real pipelines don't keep
    * the smallest doc_id of a duplicate group — they keep the best COPY
    * (re-crawls truncate, strip markup, or append boilerplate, so copies
    * differ in everything but digest-relevant text... and when digests are
    * computed on normalized text, in the raw text too). Keeper = max by
    * (gopher-pass, length, -doc_id) — the shared [[TextAnalysis.gopherCriteria]],
    * so "best" here and in the curation gates is the same predicate.
    * Spelled as `max_by` over an orderable struct, NOT row_number = 1:
    * map-side partial aggregation sends one candidate per digest per
    * partition across the one shuffle, where the window form shuffles
    * every copy of every group (q48's argument, applied to dedup).
    * doc_id in the ordering makes ties impossible ⇒ deterministic.
    */
  def dd_exact_best(s: SparkSession, dir: String): DataFrame = {
    val (okCount, okMean, okStops) = TextAnalysis.gopherCriteria()
    val d = docs(s, dir).filter(col("text").isNotNull) // see dd_exact
      .select(col("doc_id"),
      md5(col("text")).as("digest"),
      length(col("text")).cast("long").as("len"),
      (okCount && okMean && okStops).as("keep"))
    val ord = struct(col("keep").cast("int"), col("len"), -col("doc_id"))
    d.groupBy("digest")
      .agg(max_by(col("doc_id"), ord).as("keeper"),
        max_by(col("keep"), ord).as("keeper_ok"),
        max_by(col("len"), ord).as("keeper_len"),
        count(lit(1)).as("n_copies"))
      .orderBy("digest")
  }

  /** Bag-of-words fingerprint dedup: md5 of the sorted distinct word set.
    * Catches reorderings/duplicated-word variants that exact dedup misses.
    */
  def dd_fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // null text must not fingerprint: concat_ws maps a NULL word array
      // to "" — the md5 of the EMPTY-text fingerprint — silently merging
      // null-text docs with genuinely empty docs (and diverging from the
      // twin, where array_to_string(NULL) stays NULL). See dd_exact.
      .filter(col("text").isNotNull)
      .groupBy(md5(concat_ws(" ", array_sort(array_distinct(words(col("text")))))).as("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy("fp")

  /** MinHash+LSH near-dup candidate pairs: shingle → 32-hash signature →
    * 8 bands → explode band keys → self-join on band key → distinct pairs,
    * with the estimated Jaccard (signature agreement) attached.
    * Candidate generation is O(docs × bands); only bucket collisions are
    * verified. Deterministic end to end (xxhash64).
    *
    * Shuffle shape: the band self-join moves (band, bkey, doc_id) rows ONLY
    * — signatures are attached after the pair set is deduped, so the
    * k-element arrays cross the wire once per DISTINCT candidate pair
    * instead of twice per banded row (at 8 bands that is ~16× less
    * signature traffic through the widest shuffle).
    *
    * MEASURED RECALL vs exact n-gram Jaccard ground truth
    * ([[dd_ngram_jaccard]]), spec-pinned in PipelineSpec at sf0.01: the
    * trustworthy regime is NEAR-IDENTICAL pairs — J ≥ 0.8 recall 1.000;
    * the borderline band J ∈ [0.45, 0.6) measured 0.339 (banding theory:
    * collision probability 1−(1−J⁴)⁸ ≈ 0.42 at J=0.5, minus the
    * estimated-Jaccard filter). Use the default threshold for re-crawl
    * dedup; for borderline similarity, [[dd_ngram_jaccard]] is the
    * verification-grade member.
    */
  def dd_minhash(s: SparkSession, dir: String, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucket: Int = 10000): DataFrame = {
    val (grouped, repPairs) = minhashRepPairs(s, dir, k, bands, threshold, maxBucket)
    expandPairs(repPairs, "est_jaccard", grouped, lit(1.0), lit(1.0) >= threshold)
      .orderBy("a", "b")
  }

  /** The representative-level core of [[dd_minhash]]: (signature groups,
    * qualifying pairs between group representatives). Shared with
    * [[dd_cluster]], which propagates labels over representatives and maps
    * members through — identical result, clique-size-smaller graph.
    *
    * The signature-group aggregate is read by every downstream stage (the
    * band join, both verification joins, the member expansion — and in
    * [[dd_cluster]] by several separate label-propagation jobs), so it is
    * materialized ONCE with an eager [[graft.Checkpoints]] barrier
    * (localCheckpoint, or a reliable checkpoint when graft.checkpoint.dir
    * is set for cluster runs). Not `persist`:
    * checkpoint blocks are released by the ContextCleaner as soon as the
    * query's frames are dropped, where a `persist` pins CacheManager
    * memory for the whole session unless every caller remembers to
    * unpersist (the round-2 leak). Recompute-above-the-exchange is not an
    * alternative — the collect_list re-aggregation per consumer measured
    * ~2-4× slower than reading the checkpointed blocks.
    */
  private[operators] def minhashRepPairs(s: SparkSession, dir: String, k: Int,
      bands: Int, threshold: Double, maxBucket: Int): (DataFrame, DataFrame) = {
    // identical signatures collapse to one representative (same rationale
    // and same output-preserving expansion as [[dd_ngram_jaccard]]): an
    // exact-dup clique costs output rows, not clique² banded-join rows, and
    // unlike the bucket cap the clique's pairs are KEPT
    val grouped = minhashSignatures(docs(s, dir), k)
      .groupBy("sig")
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("members"))
      .graftCheckpoint()
    val sigs = grouped.select(col("rep").as("doc_id"), col("sig"))
    val preBanded = sigs
      .select(col("doc_id"), posexplode(minhashBands(col("sig"), k, bands)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
    val banded = capBuckets(preBanded, maxBucket, "dd_minhash")
    val candidates = banded.select(col("band"), col("bkey"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("bkey"), col("doc_id").as("b")), Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val repPairs = candidates
      .join(sigs.select(col("doc_id").as("a"), col("sig").as("sig_a")), Seq("a"))
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sig_b")), Seq("b"))
      .select(col("a"), col("b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
          .cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    (grouped, repPairs)
  }

  /** Expand representative-level pairs back to member pairs: cross-group
    * pairs inherit the representatives' score verbatim; intra-group pairs
    * (identical sketches/sets) are emitted directly with `selfScore` —
    * evaluated against `grouped`'s columns BEFORE members explode, so it
    * may be a constant (est 1.0, Hamming 0) or computed from the group key
    * (the self-cosine of an embedding) — when `selfQualifies` (evaluated
    * after `scoreCol` exists). Output-only work — no verification re-runs.
    */
  private def expandPairs(repPairs: DataFrame, scoreCol: String,
      grouped: DataFrame, selfScore: org.apache.spark.sql.Column,
      selfQualifies: org.apache.spark.sql.Column): DataFrame = {
    val inter = repPairs
      .join(grouped.select(col("rep").as("a"), col("members").as("ma")), Seq("a"))
      .join(grouped.select(col("rep").as("b"), col("members").as("mb")), Seq("b"))
      .select(explode(col("ma")).as("x"), col("mb"), col(scoreCol))
      .select(col("x"), explode(col("mb")).as("y"), col(scoreCol))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"), col(scoreCol))
    val intra = grouped.filter(size(col("members")) > 1)
      .select(selfScore.as(scoreCol), col("members"))
      .filter(selfQualifies)
      .select(col(scoreCol), explode(col("members")).as("x"), col("members"))
      .select(col(scoreCol), col("x"), explode(col("members")).as("y"))
      .filter(col("x") < col("y"))
      .select(col("x").as("a"), col("y").as("b"), col(scoreCol))
    inter.union(intra)
  }

  /** Skew guard for band-bucket self-joins: a bucket holding m members emits
    * m² candidate pairs, so one mega-bucket can dominate the whole job at
    * scale. Buckets larger than `maxBucket` are dropped from CANDIDATE
    * GENERATION only, bounding any single bucket's cost at maxBucket².
    *
    * What a dropped bucket LOSES: exact duplicates are already collapsed to
    * one representative before banding, so an over-cap bucket holds more
    * than `maxBucket` DISTINCT sketches agreeing on a whole band — a
    * boilerplate pathology (e.g. thousands of variants of the same
    * template). Its members are genuine near-dup CANDIDATES that no other
    * operator recovers; dropping them is a deliberate recall-for-boundedness
    * trade, so the loss must be OBSERVABLE, not silent — every action on a
    * capped operator reports dropped buckets/slots through the in-plan
    * observe() metric (see below), and [[droppedBuckets]] exposes the full
    * audit frame. Default is far above any bucket the test corpora produce,
    * so small-SF output is unchanged.
    */
  private[operators] def capBuckets(banded: DataFrame, maxBucket: Int,
      op: String = "capBuckets"): DataFrame = {
    // Always-on loss observability at zero extra jobs: the bucket-size
    // aggregate every row flows through carries an observe() metric
    // (CollectMetrics in-plan), so any action on the operator's result
    // reports how many buckets/slots the cap silently dropped — read it
    // with [[capBucketsLoss]] at ANY log level, where the previous
    // INFO-gated audit ran a whole extra job or nothing. Caveat: if AQE
    // empty-propagates the whole candidate branch (zero SURVIVING buckets
    // anywhere — a degenerate corpus), the metric node is replaced along
    // with the branch and the observation is absent; [[droppedBuckets]]
    // remains the authoritative deep-dive audit frame for that case.
    // observation names carry a per-invocation sequence number: Spark's
    // CheckAnalysis rejects a plan holding two observed-metric nodes with
    // the same name unless their subtrees are sameResult (fine for this
    // operator's self-join, fatal for compositions like
    // dd_minhash(dirA).union(dd_minhash(dirB))). [[capBucketsLoss]]
    // prefix-matches and sums, so composition aggregates losses naturally.
    val sizes = banded.groupBy("band", "bkey").agg(count(lit(1)).as("__bsz"))
      .observe(s"graft.$op.capBuckets.${metricSeq.incrementAndGet()}",
        sum(when(col("__bsz") > maxBucket, lit(1L)).otherwise(lit(0L))).as("dropped_buckets"),
        sum(when(col("__bsz") > maxBucket, col("__bsz")).otherwise(lit(0L))).as("dropped_slots"))
    banded.join(sizes.filter(col("__bsz") <= maxBucket), Seq("band", "bkey"))
      .drop("__bsz")
  }

  private val metricSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Band-buckets that [[capBuckets]] would drop at `maxBucket` — the
    * observability hook: run it (one cheap aggregate) and log the result
    * when candidate counts matter.
    */
  def droppedBuckets(banded: DataFrame, maxBucket: Int): DataFrame =
    banded.groupBy("band", "bkey").agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** The (dropped_buckets, dropped_slots) loss observed during `result`'s
    * LAST action, for a capped operator's frame (`op` = "dd_minhash" /
    * "dd_simhash"). Free — the metric rides [[capBuckets]]'s in-plan
    * observe() aggregate, no extra job at any log level. None when the
    * frame hasn't executed or isn't a capped operator's output (a metric
    * node that never saw an action holds null sums — reported as None,
    * not a crash). A composed frame (e.g. a union of two runs) carries
    * one metric node per constituent; their losses sum.
    */
  def capBucketsLoss(result: DataFrame, op: String): Option[(Long, Long)] = {
    val rows = org.apache.spark.sql.GraftObservedMetrics.of(result)
      .collect { case (name, r) if name.startsWith(s"graft.$op.capBuckets") &&
        !r.isNullAt(0) && !r.isNullAt(1) => (r.getLong(0), r.getLong(1)) }
    if (rows.isEmpty) None
    else Some(rows.foldLeft((0L, 0L))((acc, x) => (acc._1 + x._1, acc._2 + x._2)))
  }

  private val lastBloomScreen =
    new java.util.concurrent.atomic.AtomicReference[Option[(Long, Long)]](None)

  /** The most recent Bloom screen's (probes_total, probes_passed) in this
    * JVM — set by [[dd_incremental_stored]] the moment its eager exact-path
    * barrier executes (also logged at INFO). A registry read rather than a
    * [[capBucketsLoss]]-style plan walk because the screen sits above a
    * lineage-cutting checkpoint: the caller's frame never carries the
    * metric node. None until a screened run executes (no sidecar /
    * useBloom=false leave it untouched). passed/total is the shuffle
    * fraction the screen could NOT remove; when it creeps toward 1 on a
    * fresh-content delta, the sidecar's fpp has decayed (the store grew
    * past the expectedNumItems it was sized for) — rebuild it with the
    * next [[writeCorpusSignatures]]. Last-write-wins across concurrent
    * screened runs: an ops log signal, not an aggregation surface.
    */
  def lastBloomScreenStats: Option[(Long, Long)] = lastBloomScreen.get()

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
  /** SimHash near-dup pairs (Charikar's fingerprint; banded-Hamming
    * candidates, exact bit_count verify, hamming ≤ `maxHamming`).
    *
    * MEASURED RECALL vs exact n-gram Jaccard ground truth, spec-pinned in
    * PipelineSpec at sf0.01: at the default 3/64 bits the trustworthy
    * regime is only the MOST-identical tail — J ≥ 0.95 recall 0.625, and
    * exactly 0 below J 0.8 (a 64-bit fingerprint within 3 bits implies
    * far higher similarity than J=0.5). SimHash is the cheap screen for
    * re-crawl/boilerplate duplicates; [[dd_minhash]] reaches lower
    * similarity, [[dd_ngram_jaccard]] is exact.
    */
  def dd_simhash(s: SparkSession, dir: String, maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    bandedHamming64Pairs(simhashFingerprints(docs(s, dir)),
      maxHamming, maxBucket, "dd_simhash")

  /** Banded-Hamming near-dup over ANY (doc_id, fp) 64-bit fingerprint
    * frame — the one copy of the candidate/verify scaffold shared by
    * [[dd_simhash]] and [[graft.operators.Multimodal.mm_phash]], so a
    * shuffle-shape or cap fix lands in both: identical fingerprints
    * collapse to a representative BEFORE banding (ids only through the
    * band self-join, fps re-attach after dedup; materialized once,
    * auto-released — see [[minhashRepPairs]]), candidates must share one
    * of four 16-bit bands, hot buckets are capped with loss observable
    * under `op`'s metric name, verification is one codegen'd
    * `bit_count(xor)` per candidate pair, and pairs expand back through
    * clique members, (a, b, hamming) with a < b.
    */
  private[operators] def bandedHamming64Pairs(withFp: DataFrame,
      maxHamming: Int, maxBucket: Int, op: String): DataFrame = {
    val grouped = withFp
      // null fingerprints (null text/payload — the expressions are
      // null-intolerant) must not band: groupBy would collect them into
      // ONE clique and the intra path would fabricate hamming-0 "pairs"
      // between unrelated empty docs
      .filter(col("fp").isNotNull)
      .groupBy("fp")
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("members"))
      .graftCheckpoint()
    val fps = grouped.select(col("rep").as("doc_id"), col("fp"))
    val preBanded = fps.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          call_function("shiftright", col("fp"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
    val banded = capBuckets(preBanded, maxBucket, op)
    val candidates = banded.select(col("band"), col("bkey"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("bkey"), col("doc_id").as("b")), Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val repPairs = candidates
      .join(fps.select(col("doc_id").as("a"), col("fp").as("fp_a")), Seq("a"))
      .join(fps.select(col("doc_id").as("b"), col("fp").as("fp_b")), Seq("b"))
      .select(col("a"), col("b"), hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    expandPairs(repPairs, "hamming", grouped,
      lit(0).cast("int"), lit(0) <= maxHamming)
      .orderBy("a", "b")
  }

  /** SimHash fingerprints in aggregate form (same rationale as
    * [[minhashSignatures]]): one word-hash row per occurrence, bit votes
    * summed per doc, then a static 64-term OR packs the fingerprint.
    * Identical output to [[graft.functions.TextFunctions.simhash64]].
    *
    * Vote state is LANE-PACKED: 32 longs of 2×32-bit one-counts instead of
    * 64 separate ±1 sums — 2× less aggregation-buffer state per group on
    * the map-side combine (the widest aggregate in the corpus before this).
    * `vote_j > 0 ⟺ 2·ones_j > n` reproduces the signed-sum sign exactly,
    * ties included. With 32-bit lanes the top lane carries weight 2^32, so
    * the per-group `sum` stays below 2^63 (Spark 4 ANSI overflow check) for
    * any doc under ~2^31 words — no practical bound, no assert needed.
    * (The earlier 4×16-bit packing overflowed Long under ANSI at 32768
    * words — the top lane's 2^48 weight crossed the sign bit during the
    * aggregation itself, before any post-agg assert could fire.)
    */
  def simhashFingerprints(documents: DataFrame): DataFrame = {
    val wh = documents
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    // long L, lane k (k = 0..1) counts words with bit j = 2L+k set
    val packed = (0 until 32).map { l =>
      sum((0 until 2).map(k =>
        shiftright(col("h"), 2 * l + k).bitwiseAND(lit(1L)) * lit(1L << (32 * k)))
        .reduce(_ + _)).as(s"__p$l")
    }
    val ones = (j: Int) =>
      shiftright(col(s"__p${j / 2}"), 32 * (j % 2)).bitwiseAND(lit(0xFFFFFFFFL))
    wh.groupBy("doc_id")
      .agg(packed.head, (packed.tail :+ count(lit(1)).as("__n")): _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(ones(j) * 2 > col("__n"), lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("fp"))
  }

  /** Exact n-gram Jaccard near-dup via prefix filtering (the all-pairs
    * scheme of Bayardo et al., WWW'07 / ppjoin): order every document's
    * distinct shingle set by ascending document frequency (rarest first,
    * 64-bit hash tie-break — a global total order), and generate candidates
    * only from each document's PREFIX of the first `|S| - ceil(t·|S|) + 1`
    * shingles. Exactness: for any pair with J ≥ t, the order-minimum common
    * shingle must sit inside both prefixes (the suffix holds only
    * `ceil(t·|S|) - 1 < |A∩B|` elements), so no qualifying pair is missed.
    * Candidates are verified with the exact `|A∩B| / |A∪B|` from the full
    * sets. Scale shape: a boilerplate shingle appearing in f documents is
    * high-df, lands in suffixes, and generates ZERO candidate pairs —
    * versus f² for the naive inverted-index join.
    */
  /** SCALE POSITIONING (measured on the replicated corpora): exact
    * prefix-filtered Jaccard is candidate-bound — candidates grow with the
    * square of documents sharing mid-frequency shingles, so on a 500 k-doc
    * corpus with 250 k distinct small-vocab texts it measured 318 s
    * (892 s before the asymmetric-prefix + length filters) while
    * [[dd_minhash]] took 104 s and [[dd_simhash]] 14 s on the same input.
    * This operator is the verification-grade / oracle-checkable member of
    * the family; at corpus scale, generate candidates with the banded
    * sketches and reserve exact Jaccard for the candidate set.
    */
  def dd_ngram_jaccard(s: SparkSession, dir: String, n: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    val (grouped, repPairs) = ngramRepPairs(s, dir, n, threshold)
    // 2. Expand representative pairs to member pairs (every cross-group
    //    combination has the representatives' exact jaccard); intra-group
    //    pairs (identical sets) are jaccard exactly 1.0.
    expandPairs(repPairs.select("a", "b", "jaccard"), "jaccard", grouped,
      lit(1.0), lit(1.0) >= threshold)
      .orderBy("a", "b")
  }

  /** Identical-shingle-SET groups: one representative (min doc_id) + the
    * member list per distinct sorted shingle-hash array. The shared stage-0
    * of the shingle dedup family ([[dd_ngram_jaccard]], [[dd_containment]],
    * [[dd_cluster_jaccard]]) — exact-dup cliques collapse here so candidate
    * generation and verification never pay clique².
    */
  private[operators] def shingleGroups(s: SparkSession, dir: String, n: Int): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), array_sort(hashedShingles(col("text"), n)).as("shs"))
      // null text → null shs (Shingles is nullIntolerant): the groupBy
      // below would collect every null-text doc into ONE group and the
      // expandPairs intra path would fabricate jaccard-1.0 pairs between
      // unrelated docs — the exact hazard [[bandedHamming64Pairs]] guards.
      // The oracle twins agree for free: unnest(NULL) emits zero shingle
      // rows, so null-text docs never pair there either.
      .filter(col("shs").isNotNull)
      .groupBy("shs")
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("members"))
      .graftCheckpoint() // multi-consumer; materialized once, auto-released

  /** The (grouped, repPairs) stage of [[dd_ngram_jaccard]] — shared with
    * [[dd_cluster_jaccard]], which clusters representatives directly
    * instead of paying the clique² member expansion only to collapse it.
    */
  private[operators] def ngramRepPairs(s: SparkSession, dir: String, n: Int,
      threshold: Double): (DataFrame, DataFrame) = {
    // 0. Collapse identical shingle SETS to one representative. Exact-dup
    //    cliques (the classic corpus pathology) otherwise multiply every
    //    candidate pair by clique² — measured 22× runtime at a 10×-replicated
    //    corpus. Collapsed, cliques cost OUTPUT rows only (expansion below),
    //    never verification work. The sorted hash array is the group key.
    val grouped = shingleGroups(s, dir, n)
    // 1. Posting list over REPRESENTATIVES, on 64-bit shingle hashes (same
    //    pair counts — collisions at 2^-64 are below any practical risk —
    //    far cheaper shuffle + compare than shingle strings). `sh` appears
    //    twice (the df aggregate and the join's probe side) — ReuseExchange
    //    shares its shuffle within that job.
    val sh = grouped.select(col("rep").as("doc_id"),
      size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df")) // map-side partials
    // Prefix tokens with their 0-based rank in the rarest-first (df, sh)
    // total order — the ranked ORDER only matters here, for candidate
    // generation, so rank with a window instead of re-assembling per-doc
    // ranked arrays (the former `collect_list` + checkpoint of full arrays
    // measured ~0.5 s slower per query at sf0.1): a doc keeps its first
    // n - ceil(n·t) + 1 tokens. Checkpointed because the candidate self-join
    // below consumes it twice (its rows are ~60 % of tokens at t=0.4, but 4
    // scalar columns — far lighter than the full-array frame it replaces).
    val pref = sh.join(df, Seq("sh"))
      .withColumn("p", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("df", "sh")) - lit(1))
      // ε: the double product can over-ceil on exact-integer boundaries
      // (55·0.4 = 22.000000000000004 → prefix one short → a true pair
      // silently skipped); widening is always safe — verification is exact
      .filter(col("p") <
        col("n") - ceil(col("n").cast("double") * threshold - 1e-9).cast("int") + 1)
      .select(col("doc_id"), col("n"), col("p"), col("sh"))
      .graftCheckpoint()
    // Candidate generation is the ppjoin ASYMMETRIC join (Xiao et al.): a
    // qualifying pair must share a token in the probe prefix of its LONGER
    // record (|x| − ⌈t·|x|⌉ + 1 — what `pref` holds) AND in the tighter
    // INDEX prefix of its shorter one (|y| − ⌈2t/(1+t)·|y|⌉ + 1, from
    // |x| ≥ |y| ⇒ overlap ≥ 2t/(1+t)·|y|). Orientation is lexicographic
    // (length, id): each unordered pair joins in exactly one orientation,
    // and the shorter-indexed prefix is ~0.43n vs 0.6n at t=0.4 — ~30 %
    // fewer join rows for identical output. The length filter
    // (J ≤ |y|/|x| < t prunes outright) runs before the pair aggregation.
    val idxPrefLen = col("n") -
      ceil(col("n").cast("double") * (2 * threshold / (1 + threshold)) - 1e-9).cast("int") + 1
    val index = pref.filter(col("p") < idxPrefLen)
    // Positional filter (ppjoin): a token matched at ranked positions
    // (i, j) bounds the overlap — common elements before it number
    // ≤ min(i, j), after it ≤ min(|A|-i-1, |B|-j-1) — and J ≥ t needs
    // overlap ≥ t(|A|+|B|)/(1+t). Any matched token's bound is valid, so
    // candidates are kept only when their tightest bound can still reach
    // the requirement (ε guards the inexact double threshold —
    // conservative, never prunes a qualifying pair).
    val bound = least(col("pa"), col("pb")) + lit(1) +
      least(col("na") - col("pa") - 1, col("nb") - col("pb") - 1)
    val candidates = index.select(col("sh"), col("doc_id").as("a"), col("n").as("na"), col("p").as("pa"))
      .join(pref.select(col("sh"), col("doc_id").as("b"), col("n").as("nb"), col("p").as("pb")), Seq("sh"))
      .filter(col("na") < col("nb") || (col("na") === col("nb") && col("a") < col("b")))
      .filter(col("na").cast("double") >= col("nb").cast("double") * threshold - 1e-9)
      .groupBy("a", "b")
      .agg(min(bound).as("ub"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .filter(col("ub").cast("double") >=
        (col("na") + col("nb")).cast("double") * (threshold / (1 + threshold)) - 1e-9)
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
    // Verification needs only intersection SIZE — order-independent — so it
    // reads the hash-sorted arrays already materialized in `grouped` rather
    // than a second ranked-array frame, and counts the overlap with a
    // codegen'd two-pointer merge (the arrays are sorted+distinct by
    // construction) instead of `size(array_intersect(...))`'s per-pair hash
    // set + discarded result array.
    val repSets = grouped.select(col("rep").as("doc_id"), col("shs"))
    val repPairs = candidates
      .join(repSets.select(col("doc_id").as("a"), col("shs").as("sa")), Seq("a"))
      .join(repSets.select(col("doc_id").as("b"), col("shs").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.SortedOverlap.count(col("sa"), col("sb")).as("inter"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
    (grouped, repPairs)
  }

  /** [[graft.functions.VecDot.cosineFast]] with the zero-norm guard shared
    * by the whole embed-dedup family (and [[Curation.decon_embed]] /
    * [[Similarity.ann_sq]]): a degenerate all-zero embedding yields
    * 0/0 = NaN, and NaN compares GREATER than any threshold on both
    * engines — one failed embedding would pair with every vector in reach.
    * Scored -1 instead, it can never qualify. The oracle twins mirror via
    * `cosGuardSql`.
    */
  private def guardedCos(dot: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(-1.0))
      .otherwise(graft.functions.VecDot.cosineFast(dot, na, nb))

  /** Connected components over a near-dup pair graph → duplicate clusters
    * with a canonical (minimum) doc id. Iterative min-label propagation:
    * each round joins labels to edges and takes the per-node minimum —
    * O(diameter) rounds of one shuffle each, the standard scalable CC
    * formulation (no driver-side graph).
    */
  def clusterPairs(pairs: DataFrame, maxIter: Int = 10, checkEvery: Int = 2): DataFrame = {
    // localCheckpoint (not persist): every round's plan must restart from a
    // materialized leaf, or the logical plan deepens by one join per round
    // and analysis/EXCHANGE-planning cost grows O(rounds) — the round-1
    // bench charged 18 s to exactly that.
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct().graftCheckpoint()
    // Initial labels fold the FIRST propagation step into the node-distinct
    // aggregation: label₀ = min(self, neighbors) is exactly one min-label
    // round from the identity init, for free — the node list needed a
    // groupBy anyway, and small-diameter graphs (near-dup clusters are
    // mostly pairs/triples) converge one materialized round earlier.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(col("id"), min(col("dst"))).as("label"))
      .graftCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nlabel"))
      // old and new label carried together: the convergence probe scans the
      // checkpointed frame instead of re-running the join
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("__old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .graftCheckpoint()
      i += 1
      // probe after round 1 (the fused init means small-diameter graphs —
      // the common near-dup case — are often already stable there), then
      // only every `checkEvery` rounds: a wasted extra round is one cheap
      // leaf-scan join, a probe is a full driver round-trip
      if (i == 1 || i % checkEvery == 0 || i >= maxIter)
        converged = updated.filter(col("label") =!= col("__old")).isEmpty
      labels = updated.select("id", "label")
    }
    // partially-propagated labels are WRONG output (one true component
    // split into several clusters), not slightly-stale output — say so
    // loudly instead of returning them as if converged
    if (!converged)
      log.warn(s"clusterPairs: min-label propagation did NOT converge in " +
        s"$maxIter rounds — a component's diameter exceeds the round " +
        "budget, and its members carry inconsistent cluster labels. " +
        "Raise maxIter (rounds needed ~ graph diameter).")
    labels.withColumnRenamed("label", "cluster").orderBy("id")
  }

  /** Near-dup clusters from the MinHash candidate graph. Labels propagate
    * over group REPRESENTATIVES only, and members inherit their rep's
    * cluster — provably identical to clustering the expanded pair graph
    * (rep = min member of its group, so the component minimum over reps IS
    * the component minimum over members) with a clique-size-smaller graph:
    * at a 10×-replicated corpus this was 19 s → the rep graph is the 1×
    * graph.
    *
    * MEMOIZED per (session, corpus, params) as a checkpointed frame —
    * the [[dd_cluster_jaccard]] discipline, overdue here: cluster
    * assignments are a per-snapshot corpus artifact; the CC iteration is
    * a multi-job action that must not re-run per consumer per bench rep.
    */
  def dd_cluster(s: SparkSession, dir: String, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucket: Int = 10000): DataFrame = {
    import graft.Checkpoints.DatasetCheckpointOps
    clusterMinhashCache.getOrBuild(s, (dir, k, bands, threshold, maxBucket)) {
      val (grouped, repPairs) = minhashRepPairs(s, dir, k = k, bands = bands,
        threshold = threshold, maxBucket = maxBucket)
      // multi-member groups are cliques: their members are graph nodes even
      // when the rep has no inter-group edge (self-pair makes the rep a node)
      val selfNodes = grouped.filter(size(col("members")) > 1)
        .select(col("rep").as("a"), col("rep").as("b"))
      val repClusters = clusterPairs(repPairs.select("a", "b").union(selfNodes))
        .withColumnRenamed("id", "rep").withColumnRenamed("cluster", "__c")
      grouped.select(col("rep"), explode(col("members")).as("id"))
        .join(repClusters, Seq("rep"))
        .select(col("id"), col("__c").as("cluster"))
        .orderBy("id")
        .graftCheckpoint()
    }
  }
  private val clusterMinhashCache =
    new graft.SessionMemo[(String, Int, Int, Double, Int), DataFrame]

  /** PERSIST the near-dup cluster assignment frame — [[dd_cluster]]'s
    * session memo made durable (the
    * [[graft.operators.Graph.writeCcLabels]] symmetry): cluster
    * assignments are a per-snapshot corpus artifact a later keeper/
    * ablation process consumes without re-running the LSH + CC passes.
    * Shared [[graft.LabelArtifact]] discipline — write-then-swap, counts
    * + params stamped, loud loader refusals on truncation/tampering.
    * Singletons are ABSENT by [[dd_cluster]]'s contract (a doc with no
    * near-dup relation carries no row); the artifact stores exactly the
    * operator's output.
    */
  def writeDdCluster(s: SparkSession, dir: String, path: String,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = 10000): Unit =
    graft.LabelArtifact.write(s,
      dd_cluster(s, dir, k, bands, threshold, maxBucket), path,
      "id", "cluster", kind = "dd_cluster", who = "writeDdCluster",
      params = Seq("k" -> k.toString, "bands" -> bands.toString,
        "threshold" -> threshold.toString, "max_bucket" -> maxBucket.toString))

  /** Load a [[writeDdCluster]] artifact back as the (id, cluster) frame
    * [[dd_cluster]] emits — validated (see [[graft.LabelArtifact.read]]).
    */
  def readDdCluster(s: SparkSession, path: String): DataFrame =
    graft.LabelArtifact.read(s, path, "id", "cluster",
      kind = "dd_cluster", who = "readDdCluster")

  /** Connected components over the EXACT n-gram Jaccard pair graph — the
    * oracle-checkable twin of [[dd_cluster]] (whose MinHash candidate graph
    * is xxhash64-based, which the DuckDB oracle cannot express):
    * [[dd_ngram_jaccard]]'s pair set is deterministic and itself
    * oracle-verified, and min-label components are expressible in SQL as a
    * recursive transitive-closure walk, so the full cluster output
    * hash-checks end to end — closing the only operator family whose
    * semantics previously carried unit tests alone.
    *
    * Labels propagate over shingle-set REPRESENTATIVES only, and members
    * inherit their rep's cluster — identical output to clustering the
    * expanded member-pair graph (rep = min member, so the component minimum
    * over reps IS the component minimum over members; see [[dd_cluster]])
    * without paying the clique² expansion that [[expandPairs]] exists to
    * emit as OUTPUT rows.
    */
  def dd_cluster_jaccard(s: SparkSession, dir: String, n: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    import graft.Checkpoints.DatasetCheckpointOps
    // memoized per (session, corpus, params): cluster assignments are a
    // per-snapshot corpus artifact (the domainAuthority argument), and
    // samp_split_leakfree consumes this same frame — without the cache the
    // CC iteration re-runs for every consumer in every bench rep.
    // [[graft.SessionMemo]] supplies the discipline: dead-session
    // eviction, per-key in-flight dedup (the CC iteration is a multi-job
    // action; a global lock across it would serialize unrelated corpora,
    // so racers on OTHER keys proceed while same-key racers block on the
    // holder), LRU bound.
    clusterJaccardCache.getOrBuild(s, (dir, n, threshold)) {
      val (grouped, repPairs) = ngramRepPairs(s, dir, n, threshold)
      val selfNodes = grouped.filter(size(col("members")) > 1)
        .select(col("rep").as("a"), col("rep").as("b"))
      val repClusters = clusterPairs(repPairs.select("a", "b").union(selfNodes))
        .withColumnRenamed("id", "rep").withColumnRenamed("cluster", "__c")
      grouped.select(col("rep"), explode(col("members")).as("id"))
        .join(repClusters, Seq("rep"))
        .select(col("id"), col("__c").as("cluster"))
        .orderBy("id")
        .graftCheckpoint()
    }
  }
  private val clusterJaccardCache =
    new graft.SessionMemo[(String, Int, Double), DataFrame]

  /** Embedding-cosine near-dup over the embeddings table: the exact all-pairs
    * baseline (a < b halves the space; cosine is the bit-deterministic double
    * fold of [[graft.functions.TextFunctions.cosine]]). The sub-quadratic
    * scale path is the LSH bucketing of [[Similarity.withLshBucket]] /
    * [[dd_embed_lsh]].
    *
    * This plan is O(N²) BY CONSTRUCTION — it exists as the oracle anchor for
    * the LSH twin, not as a production path — so it fails fast above
    * `maxVectors` distinct embeddings (after the exact-dup collapse) instead
    * of silently launching a quadratic job on a corpus-sized input. The
    * guard's count doubles as the logged corpus-size observability hook.
    */
  def dd_embed_cosine(s: SparkSession, dir: String,
      threshold: Double = 0.4, maxVectors: Long = 100000L): DataFrame = {
    import graft.functions.VecDot
    // bit-identical embeddings collapse to one representative: an exact-dup
    // clique costs output rows, not clique² cosine evaluations. The intra
    // score is COMPUTED from the group's vector — cos(e,e) is ~1 minus sqrt
    // rounding, exactly the double the all-pairs form yields for two
    // bit-identical arrays, so the output (and the oracle hash) is unchanged.
    // Checkpointed: the guard count below and the pair join are separate
    // jobs, and the all-pairs join reads both sides from the same blocks.
    val grouped = Tables.loadParallel(s, dir, "embeddings")
      .groupBy("embedding")
      .agg(min(col("vec_id")).as("rep"), collect_list(col("vec_id")).as("members"))
      .graftCheckpoint()
    val nReps = grouped.count()
    log.info(s"dd_embed_cosine: $nReps distinct embeddings → ~${nReps * nReps / 2} candidate pairs")
    require(nReps <= maxVectors,
      s"dd_embed_cosine is the exact all-pairs baseline: $nReps distinct " +
        s"embeddings exceed maxVectors=$maxVectors (~${nReps * nReps / 2} " +
        "candidate pairs). Use dd_embed_lsh (the sub-quadratic bucketed " +
        "path) at this scale, or raise maxVectors explicitly.")
    val emb = grouped.select(col("rep").as("vec_id"), col("embedding"),
      VecDot.norm(col("embedding")).as("nrm"))
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    val repPairs = a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        guardedCos(VecDot.dot(col("ea"), col("eb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
    val selfCos = guardedCos(
      VecDot.dot(col("embedding"), col("embedding")),
      VecDot.norm(col("embedding")), VecDot.norm(col("embedding")))
    expandPairs(repPairs, "cos", grouped, selfCos, col("cos") >= threshold)
      .orderBy("a", "b")
  }

  /** Embedding near-dup, LSH-bucketed — the 100 TB path (vs the exact
    * all-pairs [[dd_embed_cosine]] baseline): random-hyperplane sign buckets
    * ([[Similarity.withLshBucket]]) shard the corpus into ~2^planes cells;
    * the pair join runs WITHIN buckets only (an equi-join Catalyst shuffles
    * on the bucket key — no cartesian), then exact cosine verifies. Two
    * vectors with cosine ≥ t collide on all `planes` sign bits with
    * probability (1 - θ/π)^planes (θ = arccos t), so high-similarity pairs
    * are rarely missed and identical vectors never are.
    */
  def dd_embed_lsh(s: SparkSession, dir: String, threshold: Double = 0.4,
      planes: Int = 4, maxBucketVectors: Long = 100000L): DataFrame = {
    import graft.functions.VecDot
    // bit-identical embeddings collapse before bucketing (identical vectors
    // always share a bucket, so a clique would pay clique² within-bucket
    // pairs); expansion emits them with the computed self-cosine.
    // Materialized once, auto-released (see [[minhashRepPairs]]).
    val grouped = Tables.loadParallel(s, dir, "embeddings")
      .groupBy("embedding")
      .agg(min(col("vec_id")).as("rep"), collect_list(col("vec_id")).as("members"))
      .graftCheckpoint()
    val emb = Similarity.withLshBucket(
      grouped.select(col("rep").as("vec_id"), col("embedding")), planes)
      .select(col("vec_id"), col("embedding"), col("bucket"),
        VecDot.norm(col("embedding")).as("nrm"))
    // the within-bucket join is quadratic PER BUCKET — a hot bucket
    // (correlated embeddings all on the same side of every hyperplane) is
    // still N²: fail fast like dd_embed_cosine's maxVectors and
    // semdedupAudit's maxCellVectors instead of silently launching it.
    // One cheap aggregate over the checkpointed distinct-embedding frame.
    val biggest = emb.groupBy("bucket").agg(count(lit(1)).as("__n"))
      .agg(coalesce(max(col("__n")), lit(0L))).first().getLong(0)
    require(biggest <= maxBucketVectors,
      s"dd_embed_lsh pair work is quadratic per bucket: the hottest of the " +
        s"2^$planes buckets holds $biggest distinct embeddings " +
        s"(> maxBucketVectors=$maxBucketVectors, ~${biggest * biggest / 2} " +
        "pairs). Raise `planes` so buckets shrink (recall falls as " +
        "(1-θ/π)^planes), or raise maxBucketVectors explicitly.")
    val a = emb.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = emb.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    val repPairs = a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        guardedCos(VecDot.dot(col("ea"), col("eb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
    val selfCos = guardedCos(
      VecDot.dot(col("embedding"), col("embedding")),
      VecDot.norm(col("embedding")), VecDot.norm(col("embedding")))
    expandPairs(repPairs, "cos", grouped, selfCos, col("cos") >= threshold)
      .orderBy("a", "b")
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup by
    * WITHIN-CLUSTER cosine pruning — cluster the embeddings with the
    * deterministic one-step Lloyd assignment (the same RNG-free-init step
    * [[Clustering.embed_kmeans_assign]] anchors to the oracle), then flag
    * every vector whose cosine to a lower-id member of its OWN cluster
    * meets `threshold`. This is how a real curation stack composes the
    * clustering and dedup families: the k-means cells bound the quadratic
    * (each cell pair-joins only against itself — an equi-join on cluster
    * id, never a cartesian), and at corpus scale k grows with N so cells
    * stay fixed-size; cross-cluster near-dups are forgone by design — the
    * documented SemDeDup approximation. Fully oracle-checked: both halves
    * (the assignment and the defined-order cosine fold) are exact algebra
    * DuckDB reproduces bit for bit.
    *
    * Like [[dd_embed_cosine]], the per-cell work is quadratic BY
    * CONSTRUCTION (that is SemDeDup's design — the cells bound it), so the
    * operator fails fast when the largest cell exceeds `maxCellVectors`
    * DISTINCT embeddings instead of silently launching a cell² job: raise
    * `k` (more, smaller cells) or the bound explicitly. Bit-identical
    * copies don't count against the bound — they collapse to one
    * representative before the pair join (see [[semdedupFlags]]), so
    * exact-dup cliques cost flag rows, never clique² pairs. The literal-centroid assignment here
    * serves k up to a few hundred; a 100 TB deployment assigns cells with
    * the same coarse quantizer the persisted IVF index uses — that form is
    * [[dd_semdedup_indexed]], which reads [[Similarity.writeIvfPqIndex]]'s
    * list partitions and runs this pruning within lists.
    *
    * Emits the per-cluster audit frame: members, flagged duplicates,
    * keepers (members − dups), and the first flagged id.
    */
  def dd_semdedup(s: SparkSession, dir: String, k: Int = 10,
      threshold: Double = 0.4, maxCellVectors: Long = 100000L): DataFrame = {
    import graft.functions.VecDot
    val raw = Tables.loadParallel(s, dir, "embeddings")
    val cents = Clustering.initCentroids(raw, k)
    // no barrier on the corpus frame: the audit's single corpus-wide
    // aggregate (the group collapse) is its only consumer — the barrier
    // sits on the smaller collapsed frame inside [[semdedupAudit]]
    val e = raw.select(col("vec_id"), col("embedding"),
      VecDot.norm(col("embedding")).as("nrm"),
      Clustering.assignTo(cents).getField("c").as("cluster"))
    semdedupAudit(e, threshold, maxCellVectors)
  }

  /** [[dd_semdedup]] assigned by a PERSISTED coarse quantizer — the 100 TB
    * form the inline operator's scaladoc promises: instead of re-deriving
    * cells from literal centroids per run, read the (vec_id, list id)
    * assignment straight off a [[Similarity.writeIvfPqIndex]] layout (the
    * index's coarse quantizer IS the same deterministic one-step Lloyd
    * assignment, so at `nlist == k` the cells — and therefore the flags —
    * are bit-identical to the inline operator; the parity spec proves it).
    *
    * Scale shape: the codes scan reads the `vec_id` column plus the `cid`
    * PARTITION value only — the PQ code words are pruned out (plan-asserted
    * in the spec), so the assignment read is a fraction of the index bytes.
    * Raw vectors come from the embeddings table via one equi-join on
    * vec_id; the within-cell pruning then equi-joins on list id exactly
    * like the inline form — quadratic only inside cells, never across.
    * Build the index once, then every semantic-dedup sweep (and every ANN
    * query batch) reuses the same cell structure without retraining.
    */
  def dd_semdedup_indexed(s: SparkSession, dir: String, indexPath: String,
      threshold: Double = 0.4, maxCellVectors: Long = 100000L): DataFrame = {
    import graft.functions.VecDot
    val assigned = indexAssignment(s, indexPath)
    val raw = Tables.loadParallel(s, dir, "embeddings")
    val e = raw.select(col("vec_id"), col("embedding"),
      VecDot.norm(col("embedding")).as("nrm"))
      .join(assigned, Seq("vec_id"))
    // the assignment join is inner: a corpus vector absent from the index
    // (a delta appended to the table but not yet to the index) would be
    // silently unflaggable and shrink the audit's member counts — require
    // the index to cover the corpus instead. The expected count reads the
    // UN-repartitioned table (Tables.load): a count over loadParallel's
    // repartition() would scan + shuffle, where this stays a
    // metadata-level parquet count. Run appendToIvfPqIndex on the delta
    // first.
    val expected = Tables.load(s, dir, "embeddings").count()
    semdedupAudit(e, threshold, maxCellVectors, expectedMembers = Some(expected))
  }

  /** The (vec_id → list id) assignment read off a persisted IVF×PQ index:
    * `cid` is the partition value, so the FILE read prunes to the vec_id
    * column alone — the PQ code words never leave disk (plan-asserted in
    * the spec against this exact frame; the operator's group-collapse
    * barrier sits above it, which hides the scan from the final plan).
    */
  private[operators] def indexAssignment(s: SparkSession, indexPath: String): DataFrame =
    s.read.parquet(s"$indexPath/codes")
      .select(col("vec_id"), col("cid").cast("int").as("cluster"))

  /** The shared SemDeDup core: guard the largest cell, flag every vector
    * whose cosine to a lower-id member of its own cell meets `threshold`,
    * and emit the per-cluster audit frame. `e` carries (vec_id, embedding,
    * nrm, cluster) — how the cluster column was assigned (literal
    * centroids vs persisted index) is the variants' only difference.
    */
  private[operators] def semdedupAudit(e: DataFrame, threshold: Double,
      maxCellVectors: Long, expectedMembers: Option[Long] = None): DataFrame = {
    // ONE corpus-wide aggregate serves everything downstream: the guard,
    // the rep-level pair join, and the member counts all read the collapsed
    // groups frame, so the lazy barrier sits HERE — on the
    // distinct-embedding frame, smaller than the corpus — and the blocks
    // release with the frames (including on the guard's failure path); see
    // [[minhashRepPairs]] on the persist leak.
    // The guard counts DISTINCT embeddings per cell — bit-identical copies
    // collapse to one representative before the pair join (semdedupFlags),
    // so a re-crawled exact-dup clique costs flag rows, not clique² pairs.
    // coalesce: aggregates over an empty embeddings table are NULL, and a
    // raw getLong would NPE here instead of reaching the intended diagnostic
    val groups = groupsOf(e).graftCheckpoint(false)
    val stats = groups.groupBy("cluster")
      .agg(count(lit(1)).as("__g"), sum(size(col("members"))).as("__m"))
      .agg(coalesce(max(col("__g")), lit(0L)), count(lit(1)),
        coalesce(sum(col("__m")), lit(0L))).first()
    val (biggest, nCells, nMembers) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    log.info(s"dd_semdedup: largest cell $biggest distinct embeddings of $nCells cells")
    require(biggest <= maxCellVectors,
      s"dd_semdedup pair work is quadratic per cell: largest cell has " +
        s"$biggest distinct embeddings (> maxCellVectors=$maxCellVectors, " +
        s"~${biggest * biggest / 2} pairs). Raise k so cells shrink, or " +
        "raise maxCellVectors explicitly.")
    expectedMembers.foreach(expected => require(nMembers == expected,
      s"dd_semdedup_indexed: the index covers $nMembers of $expected corpus " +
        "vectors — the rest joined away silently and could never be " +
        "flagged. The index is stale: appendToIvfPqIndex the delta (or " +
        "rebuild) before sweeping."))
    val dups = flagsFromGroups(groups, threshold)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_dups"), min(col("b")).as("first_dup"))
    groups.groupBy("cluster").agg(sum(size(col("members"))).as("n_members"))
      .join(dups, Seq("cluster"), "left")
      .select(col("cluster"), col("n_members"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (col("n_members") - coalesce(col("n_dups"), lit(0L))).as("n_keep"),
        col("first_dup"))
      .orderBy("cluster")
  }

  /** The flagged-id frame behind [[semdedupAudit]]: (cluster, b) for every
    * vector `b` with a lower-id same-cell member at cosine ≥ `threshold`,
    * distinct per vector (closeness to several lower-id members flags it
    * once). Exposed separately so the forgone-recall measurement (SemDeDup
    * flags vs the exact all-pairs [[dd_embed_cosine]] flags — the
    * RecallSpec floor and the README scale row) reads the production flag
    * logic rather than a reimplementation.
    *
    * Bit-identical embeddings collapse to one representative per cell
    * BEFORE the pair join — the same exact-dup clique guard as
    * [[dd_embed_cosine]] / [[dd_embed_lsh]], which SemDeDup needs even
    * more: identical vectors always share a cell (the assignment is a
    * deterministic function of the embedding alone), so a re-crawled
    * 1000-copy clique would otherwise pay clique² within-cell pairs
    * before the threshold ever filters. The flag set expands back
    * EXACTLY, because flaggedness only depends on a vector's group and
    * its group's qualifying partners:
    *   - a non-representative member's lowest-id same-cell partner is its
    *     own representative at the self-cosine (the identical-pair cosine
    *     the all-pairs form computes), so it is flagged iff that
    *     self-cosine meets the threshold;
    *   - any member `v` (representative included) is also flagged iff
    *     some OTHER group in the cell qualifies with representative
    *     (= min id) below `v` — a partner x < v exists iff min(h) < v.
    */
  private[operators] def semdedupFlags(e: DataFrame, threshold: Double): DataFrame =
    flagsFromGroups(groupsOf(e), threshold)

  /** One representative per (cell, distinct embedding), members sorted. */
  private def groupsOf(e: DataFrame): DataFrame =
    e.groupBy("cluster", "embedding", "nrm")
      .agg(min(col("vec_id")).as("rep"), array_sort(collect_list(col("vec_id"))).as("members"))

  private def flagsFromGroups(groups: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.VecDot
    val a = groups.select(col("cluster"), col("rep").as("arep"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = groups.select(col("cluster"), col("rep").as("brep"), col("embedding").as("eb"), col("nrm").as("nb"))
    // rep-level qualifying partners, both orientations (no a<b): for each
    // group, the smallest representative of any OTHER qualifying group
    val minExt = a.join(b, Seq("cluster"))
      .filter(col("arep") =!= col("brep"))
      .filter(guardedCos(VecDot.dot(col("ea"), col("eb")), col("na"), col("nb")) >= threshold)
      .groupBy(col("cluster"), col("brep").as("rep"))
      .agg(min(col("arep")).as("min_ext"))
    val withExt = groups.join(minExt, Seq("cluster", "rep"), "left")
    // the identical-pair cosine, the exact expression the all-pairs form
    // evaluates for two bit-identical arrays (see dd_embed_cosine);
    // zero-norm guarded like every pair cosine
    val selfCos = guardedCos(
      VecDot.dot(col("embedding"), col("embedding")), col("nrm"), col("nrm"))
    val intra = withExt.filter(selfCos >= threshold)
      .select(col("cluster"),
        explode(slice(col("members"), lit(2), size(col("members")) - 1)).as("b"))
    val cross = withExt.filter(col("min_ext").isNotNull)
      .select(col("cluster"),
        explode(filter(col("members"), m => m > col("min_ext"))).as("b"))
    intra.unionByName(cross).distinct()
  }

  /** Incremental dedup: classify an INCOMING batch of documents against an
    * already-curated BASE corpus — the production shape of dedup at 100 TB,
    * where yesterday's corpus is never re-paired with itself; only the
    * day's delta is checked against the corpus signatures. Verdicts per
    * incoming doc:
    *   - `exact_dup`  — its md5 digest exists in the base (match_id = the
    *     smallest base doc with that digest, jaccard = 1.0),
    *   - `near_dup`   — otherwise, some base doc's n-gram Jaccard meets
    *     `threshold` (match_id = the highest-Jaccard partner, ties to the
    *     smallest base id),
    *   - `unique`     — otherwise. Intra-batch duplicates are deliberately
    *     out of scope (that is [[dd_exact]]'s job on the batch alone).
    *
    * The façade splits the documents table deterministically (doc_id mod
    * `splitMod`: residue splitMod-1 is the incoming 20 %) so the DuckDB
    * twin can reproduce the whole classification exactly. The
    * store-backed pair [[writeCorpusSignatures]] / [[dd_incremental_stored]]
    * runs the identical core off persisted signatures — parity-spec'd —
    * which is the actual deployment shape: the base corpus is scanned once
    * at signature-build time, and every later delta touches only
    * signature parquet (digests + sorted shingle-hash sets + document
    * frequencies), never the corpus text.
    *
    * Scale shape: candidate generation is an equi join of the incoming
    * docs' PREFIX shingles against the base posting list — the one-sided
    * ppjoin prefix bound (any pair at J ≥ t shares a shingle among the
    * first |S| − ⌈t·|S|⌉ + 1 of the incoming doc's shingles in ANY fixed
    * total order; rarest-first by base df minimizes candidates) plus the
    * two-sided length filter (t·|A| ≤ |B| ≤ |A|/t). Verification reads the
    * sorted hash arrays once per candidate with the codegen'd two-pointer
    * [[graft.functions.SortedOverlap]]. No all-pairs path anywhere: work
    * is O(|delta| × candidates), independent of base corpus size.
    */
  def dd_incremental(s: SparkSession, dir: String, n: Int = 3,
      threshold: Double = 0.4, splitMod: Int = 5): DataFrame = {
    val (inc, base) = incrementalSplit(s, dir, splitMod)
    incrementalVerdicts(inc, base, n, threshold)
  }

  /** The classification core of [[dd_incremental]] on caller-supplied
    * frames (both need doc_id + text) — shared with
    * [[Curation.pipeline_incremental]], which gates the delta on quality
    * before classifying it.
    */
  private[operators] def incrementalVerdicts(inc: DataFrame, base: DataFrame,
      n: Int, threshold: Double): DataFrame = {
    val (dig, sigs, df) = corpusSignatures(base, n)
    incrementalCore(inc, dig, sigs, df, n, threshold)
  }

  /** Build + persist the base-corpus signature store under `path`:
    * `digests` (digest → smallest doc), `shingles` (doc_id, sorted distinct
    * 64-bit shingle hashes), `df` (shingle hash → document frequency),
    * plus a `digest.bloom` sidecar — a Bloom filter over the base digests
    * (1 % target fpp) that [[dd_incremental_stored]] broadcasts to screen
    * the delta's exact-dup probe MAP-SIDE. Two passes over the base corpus
    * (the digest pass and ONE shingle pass — the signature frame is
    * checkpointed in [[corpusSignatures]], so the shingles and df outputs
    * share it); everything downstream reads only the written store.
    */
  def writeCorpusSignatures(s: SparkSession, dir: String, path: String,
      n: Int = 3, splitMod: Int = 5): Unit = {
    val (_, base) = incrementalSplit(s, dir, splitMod)
    val (dig, sigs, df) = corpusSignatures(base, n)
    dig.write.mode("overwrite").parquet(s"$path/digests")
    sigs.write.mode("overwrite").parquet(s"$path/shingles")
    df.write.mode("overwrite").parquet(s"$path/df")
    // build the filter off the digest parquet just written (KB-scale reads)
    // rather than recomputing `dig` from the corpus; floor keeps tiny test
    // corpora from degenerate sizing
    val written = s.read.parquet(s"$path/digests")
    val bloom = written.stat.bloomFilter("digest", written.count().max(1024L), 0.01)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/digest.bloom"), true)
    try bloom.writeTo(out) finally out.close()
  }

  /** [[dd_incremental]] off a persisted signature store — bit-identical to
    * the inline form (parity-spec'd); the base corpus is never read.
    *
    * With `useBloom` (the default, when the store carries the sidecar) the
    * delta's digests are screened through a broadcast Bloom filter BEFORE
    * the equi join against the digest store: a definite-negative digest
    * (most of a fresh-content delta) never shuffles into the join at all,
    * and at 100 TB the digest store side of that join is the big one — the
    * screen turns "shuffle the whole delta against the store" into
    * "shuffle only the ~dup fraction (+1 % false positives)". Exactness is
    * unaffected either way: Bloom filters have no false negatives, and
    * every positive is still CONFIRMED by the join, so the output is
    * bit-identical with the screen on or off (parity-spec'd).
    */
  def dd_incremental_stored(s: SparkSession, dir: String, path: String,
      n: Int = 3, threshold: Double = 0.4, splitMod: Int = 5,
      useBloom: Boolean = true): DataFrame = {
    val (inc, _) = incrementalSplit(s, dir, splitMod)
    // parquet reads widen array elements to containsNull=true; the store is
    // written from non-null frames, so array_compact is a data no-op that
    // restores the non-null element type SortedOverlapCount requires
    val sigs = s.read.parquet(s"$path/shingles")
      .select(col("doc_id"), array_compact(col("shs")).as("shs"))
    val screen = if (useBloom) loadDigestBloom(s, path) else None
    incrementalCore(inc,
      s.read.parquet(s"$path/digests"), sigs,
      s.read.parquet(s"$path/df"), n, threshold, screen)
  }

  /** Broadcast membership test off a signature store's `digest.bloom`
    * sidecar (see [[writeCorpusSignatures]]) — None when the store
    * predates the sidecar. A UDF, not an expression: the check is one
    * broadcast-sketch probe per PROBE row (never per corpus row), so the
    * codegen break is confined to the screening filter — worth it for the
    * store-join shuffle it removes. Shared by the batch incremental path
    * and the streaming ingest gate
    * ([[graft.streaming.DocsStream.storeDedupGate]]).
    */
  private[graft] def loadDigestBloom(s: SparkSession,
      path: String): Option[Column => Column] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/digest.bloom")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bloom = try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
        finally in.close()
      val bc = s.sparkContext.broadcast(bloom)
      // Null digests (null text) must ride the definite-negative branch:
      // Spark passes null String args straight into the UDF body, and
      // `mightContainString(null)` NPEs — which would turn the "screen is
      // output-invariant" contract into a job crash on null-text corpora.
      Some(udf((d: String) => d != null && bc.value.mightContainString(d)).apply(_))
    }
  }

  /** The ONE deterministic delta/base split (residue `splitMod-1` of
    * doc_id) — shared with [[Curation.pipeline_incremental]] and the
    * DuckDB twins, so the façade's delta can never drift from
    * [[dd_incremental]]'s. */
  private[operators] def incrementalSplit(s: SparkSession, dir: String,
      splitMod: Int): (DataFrame, DataFrame) = {
    val all = docs(s, dir).select(col("doc_id"), col("text"))
    val isInc = pmod(col("doc_id"), lit(splitMod)) === lit(splitMod - 1)
    (all.filter(isInc), all.filter(!isInc))
  }

  /** Base-corpus signature frames: digest → smallest doc, one row per
    * DISTINCT shingle set (representative = min doc_id — identical sets
    * collapse, the same exact-dup-clique guard as [[ngramRepPairs]]), and
    * per-shingle document frequency over the collapsed sets. The collapse
    * is output-invariant: every base group member has the identical
    * Jaccard to any probe, so the best partner at any J is always some
    * group's MINIMUM member — exactly the representative — and the global
    * (j desc, id asc) tie-break over representatives equals the tie-break
    * over all members. A re-crawled 1000-copy clique costs one signature
    * row instead of 1000× the candidate and verify work.
    */
  private def corpusSignatures(base: DataFrame, n: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val dig = base.groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("bmatch"))
    // checkpointed: sigs has THREE consumers (the df derivation below, the
    // posting list, and the verify join in incrementalCore — or the two
    // store writes in writeCorpusSignatures), and without a barrier each
    // re-scans and RE-SHINGLES the whole base corpus; the shingle pass is
    // the expensive one, so the multi-consumer-barrier policy (see
    // minhashRepPairs) applies to exactly this frame.
    val sigs = base
      .select(col("doc_id"), array_sort(hashedShingles(col("text"), n)).as("shs"))
      .groupBy("shs").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("shs"))
      // parallel floor: the df derivation and the posting build explode
      // EVERY shingle of every signature — AQE coalesces this KB-scale
      // frame to one partition and those explodes then run single-task
      .graftCheckpoint(parallel = true)
    val df = sigs.select(explode(col("shs")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    (dig, sigs, df)
  }

  private def incrementalCore(inc: DataFrame, baseDig: DataFrame,
      baseSigs: DataFrame, df: DataFrame, n: Int, threshold: Double,
      digestScreen: Option[Column => Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = inc.select(col("doc_id"), md5(col("text")).as("digest"))
    // optional broadcast-Bloom pre-screen (see dd_incremental_stored):
    // definite-negative digests skip the store join; positives are still
    // confirmed by it, so the screen cannot change the output. The screen's
    // effectiveness rides the plan as an observe() metric (same device as
    // capBuckets): any action reports how many probes the Bloom let
    // through — at 100 TB that ratio is the number that says whether the
    // sidecar is still sized right for the store it fronts.
    val screened = digestScreen.fold(probes)(f =>
      probes.withColumn("__bloom", f(col("digest")))
        .observe(s"graft.dd_incremental.bloomScreen.${metricSeq.incrementAndGet()}",
          count(lit(1)).as("probes_total"),
          sum(when(col("__bloom"), lit(1L)).otherwise(lit(0L))).as("probes_passed"))
        .filter(col("__bloom")).drop("__bloom"))
    val preExact = screened
      .join(baseDig, "digest").select(col("doc_id"), col("bmatch"))
    // consumed by the near-path exclusion and the verdict join. EAGER only
    // when the Bloom screen is on: the eager barrier fires the screen's
    // observe() right here, so its metric is captured from preExact's
    // just-executed plan (downstream consumers see only the truncated
    // lineage — the metric node is gone from their plans, which is why
    // [[lastBloomScreenStats]] is a registry read, not a capBucketsLoss-
    // style plan walk). Without a screen there is no metric to capture and
    // the barrier can stay LAZY (round-20): the eager incGroups checkpoint
    // below materializes it as part of its own job — one driver-latency
    // job less on the façade path, same blocks for both consumers.
    val exact = preExact.graftCheckpoint(eager = digestScreen.isDefined)
    digestScreen.foreach { _ =>
      val stats = org.apache.spark.sql.GraftObservedMetrics.of(preExact.toDF())
        .collectFirst {
          case (name, r) if name.startsWith("graft.dd_incremental.bloomScreen") &&
            !r.isNullAt(0) && !r.isNullAt(1) => (r.getLong(0), r.getLong(1))
        }
      lastBloomScreen.set(stats)
      stats.foreach { case (t, p) =>
        log.info(s"dd_incremental bloom screen: $p of $t delta probes passed " +
          s"to the digest-store join (${t - p} definite negatives skipped)")
      }
    }
    // exact-matched docs never enter near-dup candidate generation: their
    // verdict is already decided (exact wins in the output CASE regardless
    // of any near partner), and in the dominant re-crawl workload MOST of
    // the delta is exact dups — this anti join removes their entire
    // shingle/prefix/verify cost, the bulk of the operator's work.
    // The survivors then collapse by DISTINCT shingle set (the incoming
    // side of the representative-collapse guard — see [[corpusSignatures]]
    // for the base side and the output-invariance argument): every member
    // of a group shares the identical best partner and Jaccard, so the
    // near path runs once per distinct set and fans the result back out.
    val incGroups = inc.join(exact.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), array_sort(hashedShingles(col("text"), n)).as("shs"))
      .groupBy("shs")
      .agg(min(col("doc_id")).as("irep"), collect_list(col("doc_id")).as("members"))
      // parallel floor: the prefix build explodes every shingle and the
      // verify join runs SortedOverlap per candidate — single-task when
      // AQE has coalesced the group frame to one partition
      .graftCheckpoint(parallel = true) // consumed by prefix build, verify join, fan-out
    val incSigs = incGroups.select(col("irep").as("doc_id"), col("shs"))
    // incoming prefix, rarest-first by BASE df (a shingle absent from the
    // base sorts first — it consumes a prefix slot but joins to nothing;
    // the exactness argument is order-independent, see scaladoc)
    val pref = incSigs
      .select(col("doc_id").as("a"), size(col("shs")).as("na"),
        explode(col("shs")).as("sh"))
      .join(df, Seq("sh"), "left")
      // pinned pre-window partitioning: the per-probe rank window otherwise
      // reads an AQE-coalesced single-partition exchange (bytes are KB but
      // rows are |delta|·|S| and the sort is the cost) — an explicit
      // repartition BY THE WINDOW KEY at the session's shuffle parallelism
      // replaces that exchange one-for-one (the window reuses the
      // partitioning; guide §2.4) and AQE leaves pinned counts alone
      .repartition(inc.sparkSession.sessionState.conf.numShufflePartitions, col("a"))
      .withColumn("p", row_number().over(
        Window.partitionBy("a").orderBy(coalesce(col("df"), lit(0L)), col("sh"))) - 1)
      // ε guards the double product from over-ceiling (20·0.55 =
      // 11.000000000000002 would shorten the prefix by one and silently
      // drop a true near-dup) — same guard as containmentRepPairs' probe
      .filter(col("p") <
        col("na") - ceil(col("na").cast("double") * threshold - 1e-9).cast("int") + 1)
      .select(col("a"), col("na"), col("sh"))
    val posting = baseSigs.select(col("doc_id").as("b"),
      size(col("shs")).as("nb"), explode(col("shs")).as("sh"))
    val candidates = pref.join(posting, "sh")
      .filter(col("nb").cast("double") >= col("na").cast("double") * threshold - 1e-9)
      .filter(col("nb").cast("double") <= col("na").cast("double") / threshold + 1e-9)
      .select(col("a"), col("b")).distinct()
    val verified = candidates
      .join(incSigs.select(col("doc_id").as("a"), col("shs").as("sa")), Seq("a"))
      .join(baseSigs.select(col("doc_id").as("b"), col("shs").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.SortedOverlap.count(col("sa"), col("sb")).as("inter"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
      .withColumn("j",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= threshold)
    val best = verified
      .withColumn("rn", row_number().over(
        Window.partitionBy("a").orderBy(col("j").desc, col("b"))))
      .filter(col("rn") === 1)
      .select(col("a").as("irep"), col("b").as("nmatch"), col("j"))
      // fan the group verdict back out to every member (output-only work)
      .join(incGroups.select(col("irep"), col("members")), Seq("irep"))
      .select(explode(col("members")).as("doc_id"), col("nmatch"), col("j"))
    // ONE verdict union + ONE left join (round-20; was two sequential left
    // joins + a CASE): `exact` and `best` are DISJOINT on doc_id by
    // construction — the anti join above removed every exact-matched doc
    // from the near path — so the union can never emit two rows for one
    // doc and the old CASE's exact-wins arbitration had nothing to
    // arbitrate. Equivalence per branch: exact → (exact_dup, bmatch, 1.0);
    // near → (near_dup, nmatch, j); neither → left-join nulls → (unique,
    // null, null), exactly the old otherwise/coalesce values. One join
    // stage (and its AQE materialization jobs) less on a query whose warm
    // cost is driver-latency-bound.
    val verdicts = exact
      .select(col("doc_id"), lit("exact_dup").as("verdict"),
        col("bmatch").as("match_id"), lit(1.0).as("jaccard"))
      .unionAll(best.select(col("doc_id"), lit("near_dup").as("verdict"),
        col("nmatch").as("match_id"), col("j").as("jaccard")))
    inc.select("doc_id")
      .join(verdicts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("verdict"), lit("unique")).as("verdict"),
        col("match_id"), col("jaccard"))
      .orderBy("doc_id")
  }

  /** Duplicate-SPAN detection (the ExactSubstr shape of Lee et al., ACL'22
    * "Deduplicating Training Data Makes Language Models Better"): find the
    * maximal word-aligned spans of each document that also occur elsewhere
    * in the corpus, at k-gram granularity. A k-gram (window of k
    * consecutive words) is *duplicated* when it occurs more than once in
    * the corpus — across documents or repeated within one, both of which
    * ExactSubstr removes. Every occurrence of a duplicated k-gram covers
    * its word interval [pos, pos+k-1]; per document, overlapping or
    * adjacent covered intervals merge into maximal spans (gaps-and-islands
    * over a running max-end window). Output is the per-document span
    * audit: span count, covered word count, longest span, covered
    * fraction — the frame a curation pipeline thresholds on (Lee et al.
    * cut spans; a Spark pipeline more often drops or trims documents whose
    * covered fraction is high).
    *
    * The suffix-array machinery of the paper is a single-machine
    * construction; the k-gram relaxation is the distributed equivalent
    * (it finds exactly the duplicated substrings of length ≥ k, quantized
    * to word boundaries) and is pure DataFrame algebra:
    *   - one shuffle on the 64-bit k-gram hash (map-side partial counts,
    *     so one row per distinct k-gram crosses the wire),
    *   - one shuffle join of occurrences against the duplicated-hash set
    *     (equi join on the hash — no quadratic anywhere; a k-gram with f
    *     occurrences contributes f rows, not f²),
    *   - one shuffle on doc_id for the island merge windows + final agg.
    * All arithmetic is integer (positions, counts) except the final
    * covered-fraction division — the oracle twin reproduces it exactly.
    *
    * Docs shorter than k words carry no k-gram and cannot be covered
    * (ExactSubstr's own length floor); they emit nothing.
    */
  def dd_spans(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val (d, spans) = spanFrames(s, dir, k)
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("se") - col("ss") + 1).as("dup_words"),
        max(col("se") - col("ss") + 1).cast("long").as("max_span"))
      .join(d.select(col("doc_id"), size(col("w")).cast("long").as("n_words")), "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_spans"), col("dup_words"),
        col("max_span"),
        (col("dup_words").cast("double") / col("n_words")).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** The all-docs words frame and the merged duplicated-span intervals
    * behind [[dd_spans]] / [[dd_spans_trim]]: `d` carries every document
    * (doc_id, text, w); `spans` carries (doc_id, ss, se) maximal intervals
    * for documents of ≥ k words with duplicated k-grams.
    */
  private def spanFrames(s: SparkSession, dir: String, k: Int)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
      .select(col("doc_id"), col("text"), words(col("text")).as("w"))
    val eligible = d.filter(size(col("w")) >= k)
    // (doc_id, pos, 64-bit k-gram hash): pos is the 0-based word index of
    // the window start. Hash before the shuffle — the corpus-wide count
    // groups long keys, never strings (same collision stance as
    // dd_ngram_jaccard: 2^-64 is below practical risk, and the DuckDB twin
    // groups the strings themselves, so a collision would surface as a
    // hash mismatch in the correctness gate).
    val occ = eligible.select(col("doc_id"),
        posexplode(shingles(col("text"), k)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos"), xxhash64(col("sh")).as("h"))
      .graftCheckpoint() // consumed twice: the dup-set count and the probe side
    val dup = occ.groupBy("h").agg(count(lit(1)).as("occs"))
      .filter(col("occs") > 1).select("h")
    val iv = occ.join(dup, "h")
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + lit(k - 1)).as("e"))
    (d, mergeIslands(iv))
  }

  /** Gaps-and-islands interval merge over (doc_id, s, e) rows: a window
    * starts a new island when it begins past the running max end + 1
    * (adjacent windows chain — they describe one contiguous region).
    * Returns merged (doc_id, ss, se). ONE definition for both the
    * dedup-side spans ([[spanFrames]]) and the decontamination-side spans
    * ([[Curation.decon_spans]]) — the two screens share the algebra by
    * construction, not by parallel editing.
    */
  private[operators] def mergeIslands(iv: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("s")
    val pme = max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    iv.withColumn("ni", when(pme.isNull || col("s") > pme + 1, 1).otherwise(0))
      .withColumn("isl", sum(col("ni")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "isl")
      .agg(min(col("s")).as("ss"), max(col("e")).as("se"))
  }

  /** The span-removal reassembly shared by [[dd_spans_trim]] and
    * [[Curation.decon_spans_trim]]: drop the words of `d` whose position
    * falls inside any merged span (left-anti interval join — spans are
    * disjoint by construction, so no word matches twice), reassemble
    * survivors in position order, and emit the per-doc trim audit with an
    * md5 of the rebuilt text. Docs of `d` untouched by `spans` pass
    * through byte-exact; a fully-covered doc trims to the empty string.
    */
  private[operators] def trimBySpans(d: DataFrame, spans: DataFrame): DataFrame = {
    val wp = d.select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "word")))
    val kept = wp.join(spans,
      wp("doc_id") === spans("doc_id") &&
        col("pos") >= col("ss") && col("pos") <= col("se"), "left_anti")
    val re = kept.groupBy("doc_id").agg(
      count(lit(1)).as("kept_words"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("word")))),
        x => x.getField("word")), " ").as("trimmed"))
    d.select(col("doc_id"), size(col("w")).cast("long").as("n_words"))
      .join(re, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("kept_words"), lit(0L)).as("kept_words"),
        md5(coalesce(col("trimmed"), lit(""))).as("trimmed_digest"))
      .orderBy("doc_id")
  }

  /** The REMOVAL half of ExactSubstr dedup ([[dd_spans]] is the audit):
    * rebuild every document with its duplicated spans cut out. Words whose
    * position falls inside any merged span are dropped (left-anti join on
    * doc_id + interval containment — spans are disjoint by construction,
    * so no word matches twice); survivors reassemble in position order.
    * Documents under k words or with no duplicated k-gram pass through
    * verbatim (the reassembly is byte-exact: split-on-space then
    * join-with-space reproduces the original, empty tokens included).
    * Output is the per-doc trim audit with an md5 of the trimmed text, so
    * the oracle pins the actual reconstruction, not just counts. A doc
    * that is entirely duplicated trims to the empty string.
    *
    * Scale shape: word-level explode is linear in corpus tokens, the
    * anti join is equi on doc_id (span lists are per-doc small), and the
    * reassembly is one groupBy(doc_id) whose collect_list is bounded by
    * document length — the same per-doc bound every text operator here
    * already carries. No quadratic anywhere.
    */
  def dd_spans_trim(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val (d, spans) = spanFrames(s, dir, k)
    trimBySpans(d, spans)
  }

  /** Containment near-dup detection — the QUOTE/SUBSET duplicate mode
    * Jaccard provably misses: a short document wholly quoted inside a long
    * one has Jaccard ≈ |short|/|long| (arbitrarily small) but containment
    * |A∩B| / min(|A|,|B|) ≈ 1. The asymmetric member of the shingle dedup
    * family (Broder's containment coefficient; the overlap similarity of
    * the set-join literature).
    *
    * Scale shape: shares [[shingleGroups]]'s exact-dup clique collapse,
    * then a ONE-SIDED prefix filter — a qualifying pair needs
    * inter ≥ ⌈t·min(na,nb)⌉, so by pigeonhole the SMALLER side must match
    * inside its first na − ⌈t·na⌉ + 1 rarest-first shingles (recall is
    * exactly 1: at most na − ⌈t·na⌉ of A's shingles fall outside B, no
    * ordering assumption needed). There is NO length filter by nature —
    * any long document can contain a short one — so the index side posts
    * ALL its shingles; candidate cost is Σ_sh prefixCount(sh)·df(sh),
    * bounded because the df-rarest-first prefix keeps boilerplate
    * (high-df) shingles out of the probe side. Verification is the
    * codegen'd sorted-merge overlap on the already-materialized sorted
    * hash arrays; intra-group (identical-set) pairs are containment
    * exactly 1.0 via the expansion. Output pairs are id-ordered; the
    * min-normalized score makes orientation irrelevant.
    *
    * Reference scope: dedup families are beyond-parity scope
    * (/root/repo/SURVEY.md §7.7); containment per Broder 1997 "On the
    * resemblance and containment of documents".
    */
  def dd_containment(s: SparkSession, dir: String, n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val (grouped, repPairs) = containmentRepPairs(s, dir, n, threshold)
    expandPairs(repPairs.select("a", "b", "containment"), "containment",
      grouped, lit(1.0), lit(1.0) >= threshold)
      .orderBy("a", "b")
  }

  private[operators] def containmentRepPairs(s: SparkSession, dir: String,
      n: Int, threshold: Double): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val grouped = shingleGroups(s, dir, n)
    val sh = grouped.select(col("rep").as("doc_id"),
      size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    // rarest-first rank; checkpointed because BOTH join sides read it
    val ranked = sh.join(df, Seq("sh"))
      .withColumn("p", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "sh")) - lit(1))
      .graftCheckpoint()
    // probe = each doc in its role as the SMALLER side: first
    // n − ⌈t·n⌉ + 1 rarest shingles (ε guards the double product from
    // over-ceiling — conservative, only ever widens the prefix)
    val probe = ranked.filter(col("p") <
        col("n") - ceil(col("n").cast("double") * threshold - 1e-9).cast("int") + 1)
      .select(col("sh"), col("doc_id").as("a"), col("n").as("na"))
    val index = ranked.select(col("sh"), col("doc_id").as("b"), col("n").as("nb"))
    val candidates = probe.join(index, Seq("sh"))
      // orientation: a is the smaller set (ties by id) — each unordered
      // pair joins in exactly one orientation, self-pairs drop out
      .filter(col("na") < col("nb") || (col("na") === col("nb") && col("a") < col("b")))
      .select("a", "b").distinct()
    val repSets = grouped.select(col("rep").as("doc_id"), col("shs"))
    val repPairs = candidates
      .join(repSets.select(col("doc_id").as("a"), col("shs").as("sa")), Seq("a"))
      .join(repSets.select(col("doc_id").as("b"), col("shs").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.SortedOverlap.count(col("sa"), col("sb")).as("inter"),
        least(size(col("sa")), size(col("sb"))).as("nmin"))
      .withColumn("containment", col("inter").cast("double") / col("nmin"))
      .filter(col("containment") >= threshold)
    (grouped, repPairs)
  }
}
