package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints.DatasetCheckpointOps
import graft.functions.TextFunctions.{shingles, words}
import graft.sources.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingest and tokenization: sub-document exact dedup, deterministic
  * stratified sampling, and benchmark-contamination screening. All three are
  * oracle-checkable (pure string/hash algebra, no RNG, no hash families
  * private to one engine).
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")

  /** Paragraph-level exact dedup (the C4 / RefinedWeb "drop repeated
    * lines/paragraphs across the corpus" pass). The synthetic corpus has no
    * newlines, so a "paragraph" is a fixed stride of `chunkWords` consecutive
    * words — same operator shape: explode sub-document units, hash, count
    * across the corpus. Emits each duplicated chunk's digest with its
    * occurrence/document counts and keeper (min doc_id).
    *
    * Scale: the explode multiplies rows by ~len/chunkWords, but each row
    * carries only a 32-char digest + doc_id; the groupBy partial-aggregates
    * map-side, so the shuffle carries one row per DISTINCT chunk. No driver
    * state, no skew hotspot (digests are uniform).
    */
  def dd_para(s: SparkSession, dir: String, chunkWords: Int = 16): DataFrame = {
    // fail loudly up front: chunkWords=0 would otherwise surface as a
    // per-row ArithmeticException deep inside executor tasks
    require(chunkWords > 0, s"dd_para: chunkWords=$chunkWords must be positive")
    // native chunker ([[graft.functions.WordChunks]]) — the composed
    // transform/slice form re-split the document once per chunk
    // (parity-spec'd byte-identical in PipelineSpec)
    val chunks = graft.functions.WordChunks.of(col("text"), chunkWords)
    docs(s, dir)
      .select(col("doc_id"), explode(chunks).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("digest"))
      .groupBy(col("digest"))
      .agg(
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper"))
      .filter(col("n_docs") > 1)
      .orderBy("digest")
  }

  /** Corpus-level LINE dedup with REWRITE — the C4 pass that dd_para only
    * reports: every repeated line (here, [[dd_para]]'s fixed `chunkWords`
    * word stride — the corpus has no newlines) is kept at its FIRST
    * occurrence in (doc_id, position) order and dropped everywhere else,
    * and each document is reassembled from its surviving lines in original
    * order. Emits per-document before/after line counts and the digest of
    * the rewritten text — the digest pins the TRANSFORM itself (the
    * [[TextAnalysis.tx_pii]] device), so the oracle certifies the rewrite,
    * not just the bookkeeping. An exact duplicate of an earlier document
    * rewrites to the empty string (n_kept = 0).
    *
    * Scale shape: explode (rows ~ corpus/chunkWords, each a digest + the
    * chunk text), ONE digest-keyed window for first-occurrence selection
    * (the shuffle volume is the corpus — the floor for any rewrite pass,
    * since surviving text must reach its document), one per-doc
    * reassembly aggregate, and a join back to the doc spine. Digest keys
    * are uniform, so the window partition has no skew hotspot; nothing is
    * collected driver-side.
    */
  def dd_lines(s: SparkSession, dir: String, chunkWords: Int = 16): DataFrame = {
    require(chunkWords > 0, s"dd_lines: chunkWords=$chunkWords must be positive")
    import org.apache.spark.sql.expressions.Window
    val chunks = graft.functions.WordChunks.of(col("text"), chunkWords)
    // null text has no lines to dedup or rewrite — excluded at the source
    // (the family invariant; a null md5 would also collapse all null docs
    // into one phantom "line")
    val d = docs(s, dir).filter(col("text").isNotNull)
    val exploded = d
      .select(col("doc_id"), posexplode(chunks).as(Seq("pos", "chunk")))
      .withColumn("digest", md5(col("chunk")))
    // (doc_id, pos) is unique, so the first-occurrence rank is a total
    // order — deterministic on both engines
    val firstOcc = exploded
      .withColumn("rn", row_number().over(
        Window.partitionBy("digest").orderBy("doc_id", "pos")))
      .filter(col("rn") === 1)
    val rebuilt = firstOcc
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
            p => p.getField("chunk")), " ").as("t"))
    d.select(col("doc_id"), size(chunks).cast("long").as("n_chunks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("t"), lit(""))).as("text_digest"))
      .orderBy("doc_id")
  }

  /** Deterministic hash-stratified sampling: a row is kept iff the first two
    * hex chars of md5(text) fall below a threshold — here "40" = 64/256 =
    * exactly 25 %. Every row decides membership locally from its own bytes:
    * no RNG seed to coordinate, no shuffle, reproducible across engines,
    * runs, and partitionings — the only sampling scheme that stays
    * referentially transparent when the 100 TB corpus is re-partitioned.
    * Emits per-(lang) stratum totals, kept counts, and the realized rate.
    */
  def samp_stratified(s: SparkSession, dir: String, hexThreshold: String = "40"): DataFrame = {
    val kept = substring(md5(col("text")), 1, 2) < lit(hexThreshold)
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("rate", col("n_kept").cast("double") / col("n_total"))
      .orderBy("lang")
  }

  /** Deterministic quota ("reservoir") sampling: keep the `k` docs with the
    * smallest md5(text) per source — rank-by-hash is a uniform sample that,
    * unlike `rand()`-based reservoirs, is reproducible across runs, engines,
    * and partitionings, so a re-run of the 100 TB job selects the identical
    * mix. The balanced-mix primitive: every source capped at the same quota.
    * One shuffle on source; at extreme stratum sizes the full per-stratum
    * sort would be replaced by a two-pass hash-threshold estimate, same
    * selection rule.
    */
  def samp_reservoir(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    // null text is excluded from every rank-by-hash sampler: md5(null) is
    // NULL, which Spark's ascending window orders FIRST (DuckDB orders it
    // LAST) — null-text docs would seize the quota slots on one engine and
    // none on the other. The Dedup-family convention (see dd_exact).
    docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("source"), col("doc_id"), col("rk"))
      .orderBy("source", "rk")
  }

  /** Class-balanced downsampling: every language capped at the SMALLEST
    * language's document count — the source/language equalization step a
    * multilingual training mix needs, distinct from rate-based
    * [[samp_stratified]] and global-quota [[samp_reservoir]]. Which docs
    * survive is content-addressed (rank by md5 within language), so the
    * balanced corpus is reproducible under any partitioning or re-ingest
    * order. Two shuffles total: the per-language count (tiny, broadcast
    * back) and the ranking window.
    */
  def samp_balanced(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("text").isNotNull) // see samp_reservoir
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
    // per-lang counts are a bounded-domain frame (#languages rows), so the
    // global-min window over it is scale-safe, and carrying cap per lang
    // keeps the join back onto the corpus an EQUI join (broadcast hash),
    // not the nested-loop a 1-row scalar cross join would plan
    val caps = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("cap",
        min(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select("lang", "cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    d.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(caps), Seq("lang"))
      .filter(col("rk") <= col("cap"))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"), min(col("h")).as("first_h"))
      .orderBy("lang")
  }

  /** Content-addressed split assignment — the ONE definition shared by
    * [[samp_split]], [[pipeline_curate]], and the streaming gate
    * ([[graft.streaming.DocsStream.curationGate]]).
    */
  private[graft] def splitOf(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p3 = substring(md5(text), 1, 3)
    when(p3 < "e66", "train").when(p3 < "f33", "val").otherwise("test")
  }

  /** Deterministic train/val/test split (≈ 0.90/0.05/0.05) from the first
    * three hex chars of md5(text): content-addressed assignment, so the same
    * document lands in the same split no matter when or where it is
    * processed — the property that keeps eval sets stable as a 100 TB corpus
    * is incrementally re-ingested. Emits per-(source, split) counts.
    */
  def samp_split(s: SparkSession, dir: String): DataFrame =
    // null text would fall through splitOf's otherwise-branch into 'test'
    // on both engines — mirrored, but it pollutes the eval split with
    // contentless docs; excluded like every sampler (see samp_reservoir)
    docs(s, dir).filter(col("text").isNotNull)
      .groupBy(col("source"), splitOf(col("text")).as("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy("source", "split")

  /** LEAKAGE-FREE split — the failure [[samp_split]] alone cannot prevent:
    * content addressing puts byte-identical copies in the same split, but
    * NEAR-duplicates hash apart, so a paraphrased copy of a training doc
    * lands in test and the eval is contaminated (the measured effect of
    * Lee et al. ACL'22 — models memorize the train twin and ace the test
    * copy). Fix: every member of a near-dup cluster
    * ([[Dedup.dd_cluster_jaccard]] — the exact, oracle-checkable member of
    * the cluster family) inherits the split of its cluster ANCHOR (min
    * doc_id)'s text; unclustered docs keep their own content address.
    * Emits the per-(source, split) census plus `n_moved` — how many docs
    * the leak rule re-assigned, the number an ablation report quotes.
    *
    * Scale shape: the cluster pass is dd_cluster_jaccard's (ppjoin prefix
    * + CC over representatives); everything after is one |clustered|-sized
    * join to fetch anchor texts (near-dup clusters are a small fraction of
    * any deduped corpus) and one map-side-combined census aggregate.
    */
  def samp_split_leakfree(s: SparkSession, dir: String, n: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    val clusters = Dedup.dd_cluster_jaccard(s, dir, n, threshold)
    val d = docs(s, dir).filter(col("text").isNotNull)
    val anchors = clusters
      .join(d.select(col("doc_id").as("cluster"), col("text").as("atext")),
        Seq("cluster"))
      .select(col("id").as("doc_id"), col("atext"))
    leakfreeCensus(d, anchors)
  }

  /** The shared anchor-split census tail of BOTH leak-free splitters
    * ([[samp_split_leakfree]], [[samp_split_leakfree_graph]]): given the
    * non-null-text docs and an (doc_id, atext) anchor-text frame, every
    * doc splits by its anchor's content address (own text where the
    * anchor carries none) and the census counts re-assignments. One
    * definition so the leak rule cannot diverge between the n-gram and
    * link-graph variants.
    */
  private def leakfreeCensus(d: DataFrame, anchors: DataFrame): DataFrame = {
    val eff = d.join(anchors, Seq("doc_id"), "left")
      .select(col("source"),
        splitOf(coalesce(col("atext"), col("text"))).as("split"),
        (splitOf(coalesce(col("atext"), col("text"))) =!=
          splitOf(col("text"))).as("moved"))
    eff.groupBy("source", "split")
      .agg(count(lit(1)).as("n"),
        sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved"))
      .orderBy("source", "split")
  }

  /** [[samp_split_leakfree]]'s GRAPH face — the leak rule anchored on the
    * link graph's connected components ([[Graph.ccLabels]]) instead of
    * n-gram cliques: documents in one citation island share provenance
    * (mirrors, re-posts, translation chains — content twins that share NO
    * n-grams and so slip past the Jaccard clusterer), and a training doc
    * whose island-mate sits in test contaminates the eval the same way a
    * paraphrase does. Every doc inherits the split of its COMPONENT
    * anchor (min member id)'s text; a doc whose anchor carries no text
    * keeps its own content address (the jaccard variant's fallback).
    * Same census shape — (source, split, n, n_moved) — so ablation
    * reports read both variants identically.
    *
    * Scale shape: the component pass is [[Graph.ccLabels]]' (O(log n)
    * star-contraction rounds, MEMOIZED per snapshot — the splitter is a
    * second consumer of the same materialized label frame, exactly the
    * consumer the labels façade exists for); after that, one
    * anchor-text join and one map-side-combined census aggregate.
    */
  def samp_split_leakfree_graph(s: SparkSession, dir: String,
      iters: Int = 12): DataFrame =
    samp_split_leakfree_graph_from(s, dir, Graph.ccLabels(s, dir, iters))

  /** The loader-fed face of [[samp_split_leakfree_graph]]: run the SAME
    * leak rule over a supplied (doc_id, component) label frame — in
    * production the PERSISTED artifact ([[Graph.readCcLabels]]), so the
    * splitter process never re-runs the star-contraction rounds (the
    * write-once-read-everywhere contract of every trained gate
    * artifact). The in-session spelling above is this function applied
    * to the memoized frame; parity is spec-pinned, so the two faces
    * cannot diverge on a document.
    */
  def samp_split_leakfree_graph_from(s: SparkSession, dir: String,
      labels: DataFrame): DataFrame = {
    val d = docs(s, dir).filter(col("text").isNotNull)
    val anchors = labels
      .join(d.select(col("doc_id").as("component"), col("text").as("atext")),
        Seq("component"))
      .select(col("doc_id"), col("atext"))
    leakfreeCensus(d, anchors)
  }

  /** The full curation funnel as ONE audit query — the composition these
    * operators exist for: normalize → Gopher quality gate (the SAME criteria
    * columns as [[TextAnalysis.tx_gopher]]) → LM fluency gate (CCNet's
    * perplexity screen — drop documents in [[TextAnalysis.tx_perplexity]]'s
    * tail bucket, i.e. `sb_mean` below the corpus p25 cut; Wenzek et al.
    * 2020 runs exactly this between quality heuristics and dedup) → exact
    * dedup on the normalized digest (min doc_id kept, via `min_by`) →
    * content-addressed split (the SAME rule as [[samp_split]]). Emits a
    * (stage, n) funnel: raw count, quality survivors, fluency survivors,
    * dedup keepers, per-split keeper counts.
    *
    * The fluency stage reuses [[TextAnalysis.perplexityScored]] (the LM
    * algebra lives once) and its cut is tx_perplexity's p25 over the WHOLE
    * scoreable corpus — the standalone scorer and the funnel stage cannot
    * disagree on a document. Quality survivors are always scoreable (the
    * Gopher band requires ≥20 words), so the inner join to the scored
    * frame drops nothing but tail documents. Beyond the LM-count passes,
    * the keeper stages share one groupBy(digest) exchange, which
    * ReuseExchange materializes once; the cut is one driver scalar.
    */
  def pipeline_curate(s: SparkSession, dir: String): DataFrame = {
    val (okCount, okMean, okStops) = TextAnalysis.gopherCriteria()
    val keep = okCount && okMean && okStops
    val base = docs(s, dir).select(col("doc_id"), col("text"))
      .withColumn("keep", keep)
      .withColumn("digest", md5(graft.functions.TextFunctions.normalize(col("text"))))
      .withColumn("split", splitOf(col("text")))
    val head = base
      .agg(count(lit(1)).as("raw"),
        // empty input: sum over zero rows is NULL — the funnel must census
        // integer zeros (profile_table's stated convention), not NULLs
        coalesce(sum(when(col("keep"), 1L).otherwise(0L)), lit(0L)).as("q"))
      .select(expr("stack(2, '0_raw', raw, '1_quality', q) AS (stage, n)"))
    // no reference LM (empty scoreable ref slice — e.g. an empty corpus):
    // the screen passes nothing, the twin's empty-pd join semantics
    val fluent = TextAnalysis.perplexityScoredOpt(s, dir) match {
      case None => base.filter(col("keep") && lit(false))
      case Some(scored) =>
        val cut = scored.agg(percentile(col("sb_mean"), lit(0.25)))
          .first().getDouble(0)
        base.filter(col("keep"))
          .join(scored.select("doc_id", "sb_mean"), Seq("doc_id"))
          .filter(col("sb_mean") >= cut)
    }
    val keepers = fluent
      .groupBy(col("digest"))
      .agg(min_by(col("split"), col("doc_id")).as("split"))
    head
      .unionAll(fluent.agg(count(lit(1)).as("n"))
        .select(lit("2_fluency").as("stage"), col("n")))
      .unionAll(keepers.agg(count(lit(1)).as("n")).select(lit("3_dedup").as("stage"), col("n")))
      .unionAll(keepers.groupBy(concat(lit("4_split_"), col("split")).as("stage"))
        .agg(count(lit(1)).as("n")))
      .orderBy("stage")
  }

  /** The DAILY-DELTA ingestion pipeline as one audit query: the incoming
    * 20 % split is quality-gated (the shared Gopher criteria), and the
    * survivors are classified against the base corpus with the
    * incremental-dedup core ([[Dedup.incrementalVerdicts]] — exact digest
    * match, else best n-gram Jaccard partner, else unique). Emits the
    * per-stage audit a production ingest run logs: delta size, quality
    * survivors, and the verdict census that decides what actually enters
    * the corpus. Same scale shape as [[Dedup.dd_incremental]]: work is
    * O(|delta| × candidates), the base corpus is touched only for its
    * signature frames, and the Gopher gate is a map-only filter applied
    * BEFORE any shingling — rejected docs never pay dedup cost.
    */
  def pipeline_incremental(s: SparkSession, dir: String): DataFrame = {
    val (okCount, okMean, okStops) = TextAnalysis.gopherCriteria()
    // the SHARED delta/base split ([[Dedup.incrementalSplit]]) — one rule,
    // one place, mirrored by both operators' oracles
    val (inc, base) = Dedup.incrementalSplit(s, dir, 5)
    val quality = inc.filter(okCount && okMean && okStops)
    val verdicts = Dedup.incrementalVerdicts(quality, base, 3, 0.4)
    inc.agg(count(lit(1)).as("n")).select(lit("0_delta").as("stage"), col("n"))
      .unionAll(quality.agg(count(lit(1)).as("n"))
        .select(lit("1_quality").as("stage"), col("n")))
      .unionAll(verdicts
        .groupBy(concat(lit("2_"), col("verdict")).as("stage"))
        .agg(count(lit(1)).as("n")))
      .orderBy("stage")
  }

  /** THE end-to-end training-data job, as one audit query: quality gate →
    * exact dedup → benchmark decontamination → temperature sampling →
    * sequence packing, emitting per-stage survivor counts (documents; the
    * final stage counts SEQUENCES). Every stage reuses the shared
    * definitions of its standalone operator ([[TextAnalysis.gopherCriteria]],
    * normalized digests, [[decon_ngram]]'s broadcast 8-gram screen,
    * [[samp_temperature]]'s hex thresholds, [[samp_pack]]'s shard windows),
    * so this query IS the composition a real pipeline would run — and the
    * DuckDB twin pins the whole funnel end to end. Scale shape: three
    * passes over the corpus (gate+digest, decon probe, pack) with only
    * digests, (lang, count) frames, and per-shard running sums shuffling.
    */
  def pipeline_train(s: SparkSession, dir: String,
      evalSource: String = "src0", budget: Int = 256): DataFrame = {
    import graft.functions.TextFunctions.normalize
    val (okCount, okMean, okStops) = TextAnalysis.gopherCriteria()
    val base = docs(s, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .withColumn("keep", okCount && okMean && okStops)
      .withColumn("digest", md5(normalize(col("text"))))
    val train = base.filter(col("source") =!= evalSource)
    // 2: exact dedup among quality survivors (keeper = min doc_id)
    val deduped = train.filter(col("keep"))
      .groupBy(col("digest"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("text")), col("doc_id")).as("r"))
      .select(col("r.doc_id"), col("r.lang"), col("r.text"))
    // 3: drop docs sharing an 8-gram with the eval slice — the SAME
    // [[gramHashes]] stream as the standalone [[decon_ngram]] screen
    val evalGrams = gramHashes(base.filter(col("source") === evalSource), 8)
      .select(col("g")).distinct()
    val flagged = gramHashes(deduped, 8)
      .join(broadcast(evalGrams), Seq("g"))
      .select("doc_id").distinct()
    val clean = deduped.join(flagged, Seq("doc_id"), "left_anti")
    // 4: temperature sampling over the decontaminated population — the
    // SHARED threshold definition ([[tempThresholds]])
    val sampled = clean
      .join(broadcast(tempThresholds(clean)), Seq("lang"))
      .filter(substring(md5(col("text")), 1, 6) < col("thr"))
    // 5: pack survivors into token-budget sequences per content shard —
    // the SHARED packing assignment ([[packAssign]])
    val seqs = packAssign(sampled, budget)
      .select("shard", "seq_id").distinct()
    train.agg(count(lit(1)).as("raw"),
        coalesce(sum(when(col("keep"), 1L).otherwise(0L)), lit(0L)).as("q"))
      .select(expr("stack(2, '0_raw', raw, '1_quality', q) AS (stage, n)"))
      .unionAll(deduped.agg(count(lit(1)).as("n")).select(lit("2_dedup").as("stage"), col("n")))
      .unionAll(clean.agg(count(lit(1)).as("n")).select(lit("3_decon").as("stage"), col("n")))
      .unionAll(sampled.agg(count(lit(1)).as("n")).select(lit("4_sample").as("stage"), col("n")))
      .unionAll(seqs.agg(count(lit(1)).as("n")).select(lit("5_sequences").as("stage"), col("n")))
      .orderBy("stage")
  }

  /** Per-language α=0.5 temperature thresholds — the ONE definition shared
    * by [[samp_temperature]] and [[pipeline_train]] (stage 4), mirroring
    * the DuckDB fragment, so the standalone operator and the funnel can
    * never drift. Input: any frame with a `lang` column; output:
    * (lang, thr) where thr is the 6-hex-char keep threshold.
    */
  /** 24-bit md5-prefix keep threshold from a raw floor(rate·2²⁴) column —
    * the ONE spelling shared by every content-addressed sampler (mixture,
    * temperature, epoch upsample) and mirrored by [[OracleSql.hexThrSql]].
    * rate ≥ 1 maps to the sentinel `"g"`, which every 6-hex-char prefix
    * compares below — the former clamp to 0xffffff silently dropped the
    * 1-in-2²⁴ docs whose prefix is exactly `ffffff` from a source whose
    * contract is "keeps 100 %" (hundreds of docs at corpus scale, and the
    * oracle twin replicated the same clamp so the gate could never see it).
    */
  private[graft] def hexThr(rawFloor: Column): Column =
    when(rawFloor >= (1L << 24), lit("g"))
      .otherwise(lower(lpad(hex(rawFloor.cast("long")), 6, "0")))

  private[graft] def tempThresholds(d: DataFrame): DataFrame =
    d.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("minn",
        min(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("thr", hexThr(
        floor(sqrt(col("minn").cast("double") / col("n").cast("double"))
          * (1 << 24)).cast("long")))
      .select("lang", "thr")

  /** Per-document sequence-packing assignment — the ONE definition shared
    * by [[samp_pack]] and [[pipeline_train]] (stage 5). Input: any frame
    * with (doc_id, text); output adds (shard, h, toks, seq_id).
    *
    * `shardHexChars` bounds packing parallelism at 16^width shards: the
    * per-shard cumulative-sum window sorts one shard per task, so width 1
    * (16 shards) caps the whole cluster at 16 tasks — ~6 TB per task at
    * 100 TB. Width 2 (256 shards, the default) keeps the same
    * content-addressed determinism (shard membership and intra-shard order
    * are functions of the text alone) while each task sorts 1/256 of the
    * corpus; widen further for larger inputs — assignments change with
    * width, but reproducibly so.
    */
  private[graft] def packAssign(d: DataFrame, budget: Int,
      shardHexChars: Int = 2): DataFrame = {
    // budget=0 would make seq_id NaN-cast-to-0 for a shard's first doc and
    // +Infinity→Long.MaxValue for the rest — silent garbage, not an error
    require(budget > 0, s"packAssign: budget=$budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // null text shards/ranks as NULL on diverging engine orders — excluded
    // like every content-addressed sampler (see samp_reservoir)
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), substring(md5(col("text")), 1, shardHexChars).as("shard"),
      md5(col("text")).as("h"),
      size(words(col("text"))).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("seq_id",
        floor((col("cum") - col("toks")).cast("double") / budget).cast("long"))
  }

  /** Target mixture weights for [[samp_mixture]] — a named-source map with
    * a default, shared with the DuckDB oracle twin (OracleSql builds its
    * CASE from this map) so operator and oracle can never drift.
    */
  private[graft] val mixtureWeights: Map[String, Double] =
    Map("src0" -> 8.0, "src1" -> 4.0, "src2" -> 2.0)
  private[graft] val mixtureDefaultWeight: Double = 1.0

  private[graft] def mixtureWeightCol(src: org.apache.spark.sql.Column,
      weights: Map[String, Double] = mixtureWeights,
      default: Double = mixtureDefaultWeight): org.apache.spark.sql.Column =
    weights.foldLeft(lit(default)) { case (acc, (name, w)) =>
      when(src === name, lit(w)).otherwise(acc)
    }

  /** The per-source hex keep thresholds behind [[samp_mixture]] — also the
    * broadcast side of the streaming
    * [[graft.streaming.DocsStream.mixtureGate]] (batch census sets the
    * rates; the stream enforces them statelessly). `weights` defaults to
    * the fixed [[mixtureWeights]]; pass [[trainedMixtureWeights]]' output
    * to run the SAME sampler on fitted weights — the plug-compatibility
    * contract of [[samp_mixture_train]].
    */
  private[graft] def mixtureThresholds(d: DataFrame,
      weights: Map[String, Double] = mixtureWeights,
      default: Double = mixtureDefaultWeight): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    d.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("w", mixtureWeightCol(col("source"), weights, default))
      .withColumn("r", col("w") / col("n").cast("double"))
      .withColumn("rate", col("r") / max(col("r")).over(w))
      .withColumn("thr", hexThr(floor(col("rate") * (1 << 24)).cast("long")))
      .select("source", "thr")
  }

  /** Fixed-target DOMAIN MIXTURE sampling — the explicit-weights
    * companion to [[samp_temperature]]'s α-flattening: a training run
    * specifies the mixture it wants per source (web 8 : books 4 : code 2
    * : everything-else 1, say), and the sampler computes per-source keep
    * rates r_s ∝ w_s / n_s, scaled so the binding source (largest
    * w_s/n_s) keeps 100 % — the best achievable approximation of the
    * target mixture WITHOUT upsampling (the published LLM data recipes'
    * standard move; repetition-based upsampling is an epoch-schedule
    * concern, not a corpus transform). Keep decisions are the library's
    * content-addressed device: md5-prefix < a hex threshold derived from
    * r_s by only correctly-rounded IEEE ops (divide, divide, floor), so
    * membership is reproducible under any partitioning, any engine, and
    * re-ingest — and the DuckDB twin hash-matches bit-for-bit. Scale
    * shape: one count aggregate (broadcast back), one map-only keep scan,
    * one per-source audit aggregate — the corpus never shuffles its text.
    */
  def samp_mixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    mixtureCensus(d, mixtureThresholds(d))
  }

  /** The shared keep-census tail of [[samp_mixture]] /
    * [[samp_mixture_trained]]: content-addressed keep decisions against a
    * broadcast per-source threshold frame, per-source audit out.
    */
  private def mixtureCensus(d: DataFrame, rates: DataFrame): DataFrame =
    d.select(col("source"), substring(md5(col("text")), 1, 6).as("p6"))
      .join(broadcast(rates), Seq("source"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("p6") < col("thr"), 1L).otherwise(0L)).as("n_kept"),
        first(col("thr")).as("thr"))
      .orderBy("source")

  /** [[samp_mixture]] under the FITTED weights — the full DoReMi loop as
    * one query: train ([[samp_mixture_train]]'s trajectory, memoized via
    * the scored-frame cache), fold the last round into the weight map,
    * and run the UNCHANGED content-addressed sampler against it. A source
    * absent from training (no scoreable docs) falls to the uniform share
    * 10⁶ div n_domains — the weight an unfitted domain deserves, NOT the
    * fixed map's 1.0 (which on the millionths scale would effectively
    * drop it). Same scale shape as samp_mixture: one count aggregate, one
    * map-only keep scan, one audit aggregate; the training adds one
    * domain-cardinality aggregate over the memoized scored frame.
    */
  def samp_mixture_trained(s: SparkSession, dir: String,
      iters: Int = mixtureTrainIters): DataFrame = {
    val d = docs(s, dir)
    val trained = trainedMixtureWeights(s, dir, iters)
    val uniform = (1000000L / trained.size).toDouble
    mixtureCensus(d, mixtureThresholds(d, trained, default = uniform))
  }

  /** [[samp_mixture_train]]'s update constants — shared with the DuckDB
    * twin (OracleSql builds its round CTEs from these), so operator and
    * oracle cannot drift. Eta is the millionths-of-weight gained per unit
    * of fixed-point excess loss per round; smooth is DoReMi's uniform
    * re-mix c in millionths.
    */
  private[graft] val mixtureTrainEta: Long = 50L
  private[graft] val mixtureTrainSmooth: Long = 10000L
  private[graft] val mixtureTrainIters: Int = 5

  /** TRAINABLE domain-mixture weights — the DoReMi recipe (Xie et al.
    * 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining") spelled in the library's fixed-point integer algebra:
    * domains whose loss exceeds the current mixture's weighted average
    * gain weight multiplicatively each round, then weights renormalize
    * and re-mix a sliver of uniform (DoReMi's smoothing, here
    * [[mixtureTrainSmooth]] millionths). The per-domain loss signal is
    * the REAL per-snapshot fluency artifact, not a plant: the
    * token-weighted mean of [[TextAnalysis.perplexityScored]]'s
    * stupid-backoff score per source (LOW fluency = hard domain = more
    * weight — the group-DRO direction). The exponentiated-gradient step
    * is linearized to the multiplicative-weights update
    * `w·(10⁶ + η·excess) div 10⁶` (Arora–Hazan–Kale's MW ≈ Hedge to
    * first order) so every round is pure 64-bit integer algebra —
    * bit-deterministic on any engine, and the WHOLE training trajectory
    * unrolls into a DuckDB hash oracle (the tx_score_train device). Both
    * clamps (`max(1, factor)`, `max(1, weight)`) keep every division
    * operand non-negative, so Scala's truncating `/` equals the twin's
    * floor `//` everywhere.
    *
    * Emits the full trajectory: (round, source, flu, excess, weight) for
    * rounds 0 (uniform init, excess 0) through `iters`; `weight` is in
    * millionths of the mixture. [[trainedMixtureWeights]] folds the last
    * round into a [[mixtureWeights]]-shaped map consumed UNCHANGED by
    * [[mixtureThresholds]] / [[samp_mixture]] / the streaming
    * mixtureGate — the plug-compatibility contract, spec-pinned.
    *
    * Scale shape: ONE distributed join+aggregate produces the per-domain
    * loss table (the memoized scored frame × a doc_id-keyed source
    * lookup — output is domain-cardinality, ~10–10³ rows in any real
    * mixture; DoReMi itself fits 22 domains), which is collected like a
    * centroid table; the rounds are O(iters·domains) driver arithmetic —
    * the corpus is scanned exactly as often as tx_perplexity scans it
    * (zero extra times when the memo is warm).
    */
  def samp_mixture_train(s: SparkSession, dir: String,
      iters: Int = mixtureTrainIters): DataFrame = {
    require(iters >= 1, s"samp_mixture_train: iters=$iters must be >= 1")
    import s.implicits._
    val domains = mixtureDomainLoss(s, dir)
    val nd = domains.size
    require(nd >= 2, s"samp_mixture_train: $nd domain(s) — fitting a " +
      "mixture needs at least two sources to trade off")
    val u = 1000000L / nd
    var w: Seq[Long] = Seq.fill(nd)(u)
    val traj = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long)]
    domains.foreach { case (src, flu) => traj += ((0L, src, flu, 0L, u)) }
    for (r <- 1 to iters) {
      val wsum = w.sum
      val wavg = domains.zip(w).map { case ((_, f), wi) => f * wi }.sum / wsum
      val excess = domains.map { case (_, f) => wavg - f }
      val raw = w.zip(excess).map { case (wi, e) =>
        math.max(1L, wi * math.max(1L, 1000000L + e * mixtureTrainEta) / 1000000L)
      }
      val rsum = raw.sum
      w = raw.map(x => math.max(1L,
        ((1000000L - mixtureTrainSmooth) * (x * 1000000L / rsum) +
          mixtureTrainSmooth * u) / 1000000L))
      domains.indices.foreach { i =>
        traj += ((r.toLong, domains(i)._1, domains(i)._2, excess(i), w(i)))
      }
    }
    traj.toSeq.toDF("round", "source", "flu", "excess", "weight")
      .orderBy("round", "source")
  }

  /** The planted REFERENCE-MODEL loss table of [[samp_mixture_train_excess]],
    * as a deterministic function of the source name: ref_flu(source) =
    * [[mixtureRefBase]] + [[mixtureRefStep]] · (first md5 hex digit of the
    * name). In production this table is the reference model's per-domain
    * eval pass (DoReMi trains a small reference on the uniform mixture and
    * freezes its losses); the corpus carries no reference model, so the
    * plant stands in — content-addressed like every other plant
    * (teacherWeights convention), landing in the fluency band the real
    * artifact occupies (~32k–39k fixed-point), so clipped excesses are
    * non-degenerate: some domains above their reference, some below.
    */
  private[graft] val mixtureRefBase: Long = 30000L
  private[graft] val mixtureRefStep: Long = 800L
  private[graft] def mixtureRefFlu(source: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(source.getBytes("UTF-8"))
    mixtureRefBase + mixtureRefStep * ((d(0) >> 4) & 0xf)
  }

  /** [[samp_mixture_train]] in the PUBLISHED DoReMi form: the per-round
    * weight gain is the EXCESS LOSS vs a frozen reference model,
    * λ_i = max(0, ℓ_proxy,i − ℓ_ref,i) — on the fluency scale (higher
    * fluency = lower loss) that is max(0, ref_flu_i − flu_i): domains
    * whose measured fluency falls SHORT of their reference get weight;
    * domains already at or above reference are clipped to zero gain
    * (Xie et al. 2023 eq. 2's per-domain excess, where
    * [[samp_mixture_train]] substitutes deviation from the mixture's own
    * weighted average — the self-referential form kept for comparison;
    * the spec pins a plant where the two DISAGREE on the hardest domain).
    * λ is frozen with the reference (the proxy is a per-snapshot scoring
    * artifact, not a model being retrained mid-loop), so rounds evolve
    * through the multiplicative update, renormalization, and DoReMi's
    * uniform re-mix exactly as in the raw form — same fixed-point
    * integer algebra, same clamps, whole trajectory a DuckDB hash oracle.
    *
    * Scale shape: identical to [[samp_mixture_train]] — the loss table is
    * the SAME memoized domain-cardinality aggregate (no extra scan; the
    * reference table is name arithmetic), rounds are O(iters·domains)
    * driver work.
    */
  def samp_mixture_train_excess(s: SparkSession, dir: String,
      iters: Int = mixtureTrainIters): DataFrame = {
    require(iters >= 1, s"samp_mixture_train_excess: iters=$iters must be >= 1")
    import s.implicits._
    val domains = mixtureDomainLoss(s, dir)
    val nd = domains.size
    require(nd >= 2, s"samp_mixture_train_excess: $nd domain(s) — fitting " +
      "a mixture needs at least two sources to trade off")
    val refs = domains.map { case (src, _) => mixtureRefFlu(src) }
    val lam = domains.zip(refs).map { case ((_, f), ref) => math.max(0L, ref - f) }
    val u = 1000000L / nd
    var w: Seq[Long] = Seq.fill(nd)(u)
    val traj = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long, Long)]
    domains.indices.foreach { i =>
      traj += ((0L, domains(i)._1, domains(i)._2, refs(i), lam(i), u))
    }
    for (r <- 1 to iters) {
      val raw = w.zip(lam).map { case (wi, l) =>
        math.max(1L, wi * (1000000L + l * mixtureTrainEta) / 1000000L)
      }
      val rsum = raw.sum
      w = raw.map(x => math.max(1L,
        ((1000000L - mixtureTrainSmooth) * (x * 1000000L / rsum) +
          mixtureTrainSmooth * u) / 1000000L))
      domains.indices.foreach { i =>
        traj += ((r.toLong, domains(i)._1, domains(i)._2, refs(i), lam(i), w(i)))
      }
    }
    traj.toSeq.toDF("round", "source", "flu", "ref_flu", "excess", "weight")
      .orderBy("round", "source")
  }

  /** [[samp_mixture_train_excess]]'s last round as a
    * [[mixtureWeights]]-shaped map — the excess-form twin of
    * [[trainedMixtureWeights]], plug-compatible with the unchanged
    * content-addressed sampler.
    */
  private[graft] def trainedMixtureWeightsExcess(s: SparkSession, dir: String,
      iters: Int = mixtureTrainIters): Map[String, Double] = {
    samp_mixture_train_excess(s, dir, iters)
      .filter(col("round") === iters.toLong)
      .select("source", "weight").collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
  }

  /** [[samp_mixture_trained]] under the PUBLISHED-form weights — the full
    * excess-loss DoReMi loop as one query: train
    * ([[samp_mixture_train_excess]], riding the memoized loss table),
    * fold the last round, run the UNCHANGED content-addressed sampler.
    * Same unfitted-source fallback (uniform share) and the same census
    * tail as every mixture sampler.
    */
  def samp_mixture_trained_excess(s: SparkSession, dir: String,
      iters: Int = mixtureTrainIters): DataFrame = {
    val d = docs(s, dir)
    val trained = trainedMixtureWeightsExcess(s, dir, iters)
    val uniform = (1000000L / trained.size).toDouble
    mixtureCensus(d, mixtureThresholds(d, trained, default = uniform))
  }

  /** The per-domain loss table behind [[samp_mixture_train]]: source →
    * token-weighted mean fluency (`Σ sb_sum div Σ n_bigrams`, integer),
    * sorted by source for a deterministic round order. Bounded collect:
    * one row per domain. Memoized per (session, dir) — the trainer AND
    * the trained sampler both consume it, and bench reps must not re-run
    * the aggregate (the value is a driver-side Seq, but the memo is
    * session-keyed anyway for uniformity with the frame caches and to
    * evict with the session that priced it).
    */
  private val mixtureLossCache = new graft.SessionMemo[String, Seq[(String, Long)]]
  private def mixtureDomainLoss(s: SparkSession, dir: String): Seq[(String, Long)] =
    mixtureLossCache.getOrBuild(s, dir) {
      docs(s, dir).select(col("doc_id"), col("source"))
        .join(TextAnalysis.perplexityScored(s, dir), Seq("doc_id"))
        .groupBy("source")
        .agg(sum(col("sb_sum")).as("ss"), sum(col("n_bigrams")).as("nb"))
        .select(col("source"), expr("ss div nb").as("flu"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    }

  /** [[samp_mixture_train]]'s last round as a [[mixtureWeights]]-shaped
    * map (source → positive weight; scale is irrelevant — the sampler
    * normalizes by the binding source). Unknown sources fall to the
    * caller's default exactly as with the fixed map.
    */
  private[graft] def trainedMixtureWeights(s: SparkSession, dir: String,
      iters: Int = mixtureTrainIters): Map[String, Double] = {
    val t = samp_mixture_train(s, dir, iters)
      .filter(col("round") === iters.toLong)
      .select("source", "weight").collect()
    t.map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
  }

  /** Temperature-flattened multilingual sampling (the mT5/XLM-R mixture
    * step, α = 0.5): each language keeps a sqrt-flattened fraction of its
    * documents relative to the SMALLEST language — rate_l = √(n_min/n_l),
    * so the smallest language keeps ~everything and dominant languages are
    * downsampled toward balance without the hard cap of [[samp_balanced]].
    * Selection is content-addressed: keep iff the first 6 hex chars of
    * md5(text) fall below the language's threshold. Bit-reproducible across
    * engines because every float op in the threshold (one divide, one sqrt,
    * one multiply, one floor) is IEEE correctly-rounded with a fixed order —
    * no summations, no pow — and the comparison itself is hex-string vs
    * hex-string. Thresholds derive from the bounded per-language count
    * frame (broadcast); the corpus pass is map-only.
    */
  def samp_temperature(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val counts = tempThresholds(d)
    d.select(col("lang"), substring(md5(col("text")), 1, 6).as("p6"))
      .join(broadcast(counts), Seq("lang"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("p6") < col("thr"), 1L).otherwise(0L)).as("n_kept"),
        first(col("thr")).as("thr"))
      .orderBy("lang")
  }

  /** Sequence packing (training-batch prep): concatenate documents in a
    * deterministic order and cut the stream into fixed token-budget
    * training sequences — the GPT-style packing pass between curation and
    * tokenization. Packing is per content-addressed SHARD
    * (first two md5 hex chars, 256 shards): a global greedy pack would
    * serialize on one cumulative sum, while per-shard packing runs one
    * window per shard partition — embarrassingly parallel, and still fully
    * deterministic because shard membership and intra-shard order are both
    * functions of content alone. A doc whose tokens cross the boundary
    * starts at its cumsum's bucket (documents are not split here; the
    * budget is a soft target, standard for doc-boundary-respecting
    * packing). Emits per-(shard, seq) audit rows.
    */
  def samp_pack(s: SparkSession, dir: String, budget: Int = 256): DataFrame =
    packAssign(docs(s, dir), budget)
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("shard", "seq_id")

  /** FUZZY benchmark decontamination: exact n-gram Jaccard between every
    * training document and every eval document sharing at least one shingle
    * — the near-dup complement to [[decon_ngram]]'s exact-overlap screen
    * (a lightly paraphrased eval item shares most but not all 8-grams, so
    * the exact screen under-flags it; set similarity catches it).
    *
    * Recall is 1 by construction, not probabilistic: any pair with J > 0
    * shares a shingle, so the postings equi-join enumerates every
    * qualifying pair — which is what makes this oracle-checkable where a
    * banded-minhash screen would not be. The scale shape exploits the
    * asymmetry decontamination always has: the EVAL side (a benchmark) is
    * small, so its exploded postings broadcast and the 100 TB training side
    * joins map-side — it never shuffles; the only shuffle is the
    * (train_doc, eval_doc) overlap count, map-side-combined and bounded by
    * actually-shared shingles. Jaccard = o/(n_a + n_b − o) is one double
    * division over exact integers — bit-identical on any engine.
    */
  def decon_jaccard(s: SparkSession, dir: String, n: Int = 3,
      evalSource: String = "src0", threshold: Double = 0.5): DataFrame = {
    // threshold=0 degenerates the prefix bound to ne+1 and the length cap
    // to Infinity — every shingle-sharing pair enumerates (near-cartesian);
    // >1 is unsatisfiable. Fail loudly, the Similarity guard convention.
    require(threshold > 0.0 && threshold <= 1.0,
      s"decon_jaccard: threshold=$threshold must be in (0, 1]")
    import graft.functions.TextFunctions.hashedShingles
    val w = org.apache.spark.sql.expressions.Window
    val base = docs(s, dir).select(col("doc_id"), col("source"),
      array_sort(hashedShingles(col("text"), n)).as("shs"))
    // identical shingle sets collapse to one representative PER SIDE — the
    // same clique² guard as dd_ngram_jaccard: re-crawled exact copies cost
    // output rows, never verification work
    // consumed by postings, verification, and expansion — LAZY barrier
    // ([[graft.Checkpoints]]): not eager (nothing computes at
    // operator-construction time) and, unlike persist, blocks are released
    // by the ContextCleaner when the query's frames drop (persist pinned
    // CacheManager memory for the whole session — the round-2 leak). A
    // cluster deployment sets graft.checkpoint.dir once and this becomes a
    // reliable checkpoint that survives executor loss.
    def collapse(side: DataFrame): DataFrame = side
      .groupBy("shs")
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("members"))
      .graftCheckpoint(false)
    val tg = collapse(base.filter(col("source") =!= evalSource))
    val eg = collapse(base.filter(col("source") === evalSource))
    // Eval-side prefix postings, rarest-first (Chaudhuri/Bayardo): a pair
    // with overlap ≥ ⌈t·|y|⌉ cannot hide ALL its common tokens in y's last
    // ⌈t·|y|⌉ − 1 ranked positions, so joining the FULL training postings
    // against only y's first |y| − ⌈t·|y|⌉ + 1 tokens keeps recall exactly 1
    // — one-sided prefix filtering needs no global order on the 100 TB side
    // (no train-side window, no train-side df): all ranking work happens on
    // the benchmark-sized eval corpus and broadcasts.
    val esh = eg.select(col("rep").as("eval_doc"), size(col("shs")).as("ne"),
      explode(col("shs")).as("sh"))
    val edf = esh.groupBy("sh").agg(count(lit(1)).as("df"))
    val eprefix = esh.join(edf, Seq("sh"))
      .withColumn("p", row_number().over(
        w.partitionBy("eval_doc").orderBy("df", "sh")) - lit(1))
      // ε guards the double product from over-ceiling (widening the prefix
      // is always safe; the Jaccard verify is exact) — see dd_ngram_jaccard
      .filter(col("p") <
        col("ne") - ceil(col("ne").cast("double") * threshold - 1e-9).cast("int") + 1)
      .select(col("sh"), col("eval_doc"), col("ne"))
    // candidates: training postings map-side-join the broadcast prefix,
    // with the Jaccard length filter (t·|y| ≤ |x| ≤ |y|/t) applied in-join
    val tsh = tg.select(col("rep").as("doc_id"), size(col("shs")).as("nt"),
      explode(col("shs")).as("sh"))
    val cands = tsh.join(broadcast(eprefix), Seq("sh"))
      .filter(col("nt").cast("double") >= col("ne").cast("double") * threshold - 1e-9 &&
        col("nt").cast("double") <= col("ne").cast("double") / threshold + 1e-9)
      .select("doc_id", "eval_doc").distinct()
    // exact verification on the sorted arrays (codegen'd two-pointer merge)
    val repPairs = cands
      .join(tg.select(col("rep").as("doc_id"), col("shs").as("sa")), Seq("doc_id"))
      .join(broadcast(eg.select(col("rep").as("eval_doc"), col("shs").as("sb"))),
        Seq("eval_doc"))
      .select(col("doc_id"), col("eval_doc"),
        graft.functions.SortedOverlap.count(col("sa"), col("sb")).as("o"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
      .select(col("doc_id"), col("eval_doc"),
        (col("o").cast("double") / (col("na") + col("nb") - col("o")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // expand representatives to member pairs (scores carry verbatim)
    repPairs
      .join(tg.select(col("rep").as("doc_id"), col("members").as("ma")), Seq("doc_id"))
      .join(broadcast(eg.select(col("rep").as("eval_doc"), col("members").as("mb"))),
        Seq("eval_doc"))
      .select(explode(col("ma")).as("doc_id"), col("mb"), col("jaccard"))
      .select(col("doc_id"), explode(col("mb")).as("eval_doc"), col("jaccard"))
      .orderBy("doc_id", "eval_doc")
  }

  /** Benchmark-contamination screen (the n-gram overlap check run before
    * training): does a candidate training document share any `n`-word
    * shingle with the held-out evaluation set? Here the `src0` slice of the
    * corpus stands in for the benchmark. Emits contaminated training docs
    * with overlap counts.
    *
    * Scale: real benchmark suites are a few MB of text, so the distinct
    * eval-shingle set is broadcast — the 100 TB training side never
    * shuffles; contamination is a map-side hash probe. Shingles travel as
    * md5 digests, not raw strings, to keep the broadcast and probe rows
    * narrow.
    */
  /** (doc_id, g) md5'd-distinct-n-gram stream — the ONE shingle→digest
    * spelling behind the exact decontamination screen, shared by
    * [[decon_ngram]] and [[pipeline_train]]'s stage 3 (the funnel's
    * docstring claims it reuses the screen; this makes that true by
    * construction — a change to the shingling cannot silently leave the
    * funnel behind, the splitOf/hexThr/packAssign convention).
    */
  private def gramHashes(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"),
      explode(array_distinct(shingles(col("text"), n))).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("g"))

  def decon_ngram(s: SparkSession, dir: String, n: Int = 8, evalSource: String = "src0"): DataFrame = {
    val d = docs(s, dir)
    val evalGrams = gramHashes(d.filter(col("source") === evalSource), n)
      .select(col("g")).distinct()
    gramHashes(d.filter(col("source") =!= evalSource), n)
      .join(broadcast(evalGrams), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  /** URL-level DECONTAMINATION — the third screen of the decon family
    * (exact n-grams, fuzzy Jaccard, embeddings — and now provenance):
    * benchmark datasets publish their source URLs, and a training doc
    * crawled from the SAME page as an eval doc is contaminated regardless
    * of how the text was re-rendered (The Pile / C4 both screen by URL).
    * A training doc is flagged when its NORMALIZED url
    * ([[TextAnalysis.normUrl]] — the tx_url_dedup key, one shared
    * definition) matches any eval-slice doc's; emits the matched training
    * docs with the smallest matching eval doc and the match count.
    *
    * Scale shape: the eval side aggregates to one row per distinct eval
    * URL and BROADCASTS (benchmarks are KB-to-MB scale); the corpus side
    * is map-only against it — the decon_ngram shape on a provenance key.
    *
    * The eval slice is a doc_id residue (the rel_diff device), NOT
    * decon_ngram's source slice: the generator assigns source = src(id
    * mod 20) and the planted URL path is also id mod 20, so a
    * source-sliced eval set could never share a URL with training docs —
    * the screen would be structurally vacuous.
    */
  def decon_url(s: SparkSession, dir: String, evalMod: Int = 3): DataFrame = {
    require(evalMod >= 2, s"decon_url: evalMod=$evalMod needs both slices nonempty")
    val isEval = pmod(col("doc_id"), lit(evalMod)) === 0
    val withUrl = docs(s, dir).select(col("doc_id"),
      TextAnalysis.normUrl(col("doc_id")).as("norm_url"), isEval.as("is_eval"))
    val evalUrls = withUrl.filter(col("is_eval"))
      .groupBy("norm_url")
      .agg(min(col("doc_id")).as("eval_min"), count(lit(1)).as("n_eval"))
    withUrl.filter(!col("is_eval"))
      .join(broadcast(evalUrls), Seq("norm_url"))
      .select(col("doc_id"), col("norm_url"), col("eval_min"), col("n_eval"))
      .orderBy("doc_id")
  }

  /** SUBSTRING-level decontamination — the GPT-3/PaLM appendix-C standard
    * the n-gram screen under-catches: a training doc is contaminated when
    * it shares an exact span of ≥ k consecutive words with ANY eval doc,
    * and the audit reports HOW MUCH (span count, covered words, longest
    * span, covered fraction), because the removal decision differs by
    * overlap size (drop the doc vs trim the span — Brown et al. 2020 §C
    * mask; Chowdhery et al. 2022 drop at ≥70 % 8-gram overlap).
    * [[decon_ngram]] counts matching FIXED grams; this merges them into
    * maximal contaminated intervals — [[graft.operators.Dedup.dd_spans]]'
    * k-gram + gaps-and-islands device pointed at an eval slice instead of
    * at the corpus itself.
    *
    * Eval slice = doc_id residue (the [[decon_url]] rationale: the
    * generator's source column is id-mod-correlated with content, so a
    * source-sliced eval set would make the screen structurally vacuous).
    *
    * Scale shape: the eval side reduces to a DISTINCT k-gram hash set and
    * BROADCASTS (benchmarks are KB-to-MB; a 1M-gram eval suite is an 8 MB
    * long-array — trivially broadcastable at any corpus size); the corpus
    * side is one map-side explode + broadcast-hash probe (no shuffle to
    * find matches), then ONE doc_id shuffle for the island merge + final
    * aggregate. Cost is O(corpus tokens) + O(matched grams log) —
    * independent of eval-set pairing, no quadratic anywhere. Docs shorter
    * than k words carry no k-gram and cannot be flagged (the ExactSubstr
    * length floor).
    */
  def decon_spans(s: SparkSession, dir: String, k: Int = 8,
      evalMod: Int = 3): DataFrame = {
    val (d, spans) = deconSpanFrames(s, dir, k, evalMod)
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("se") - col("ss") + 1).as("overlap_words"),
        max(col("se") - col("ss") + 1).cast("long").as("max_span"))
      .join(d.select(col("doc_id"), size(col("w")).cast("long").as("n_words")), "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_spans"),
        col("overlap_words"), col("max_span"),
        (col("overlap_words").cast("double") / col("n_words")).as("overlap_frac"))
      .orderBy("doc_id")
  }

  /** The (training docs, merged eval-overlap intervals) frames behind
    * [[decon_spans]] (the audit) and [[decon_spans_trim]] (the removal) —
    * [[Dedup.dd_spans]]' spanFrames shape pointed at the eval slice; the
    * machinery lives exactly once. `d` carries every non-null-text
    * TRAINING doc; `spans` the maximal contaminated word intervals.
    */
  private def deconSpanFrames(s: SparkSession, dir: String, k: Int,
      evalMod: Int): (DataFrame, DataFrame) = {
    require(k >= 2, s"decon_spans: k=$k must be >= 2")
    require(evalMod >= 2, s"decon_spans: evalMod=$evalMod needs both slices nonempty")
    val isEval = pmod(col("doc_id"), lit(evalMod)) === 0
    // null text carries no grams and cannot be trimmed — exclude up front
    // so the trim's left join never fabricates a "fully trimmed" null doc
    val d = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        words(col("text")).as("w"), isEval.as("is_eval"))
    val eligible = d.filter(size(col("w")) >= k)
    // hash before any join — the probe carries longs, never gram strings
    // (dd_spans' collision stance: 2^-64, and the DuckDB twin joins the
    // strings themselves, so a collision surfaces as a gate mismatch)
    val evalGrams = eligible.filter(col("is_eval"))
      .select(explode(shingles(col("text"), k)).as("sh"))
      .select(xxhash64(col("sh")).as("h")).distinct()
    val iv = eligible.filter(!col("is_eval"))
      .select(col("doc_id"), posexplode(shingles(col("text"), k)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos"), xxhash64(col("sh")).as("h"))
      .join(broadcast(evalGrams), "h")
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + lit(k - 1)).as("e"))
    // overlapping/adjacent covered intervals merge via the ONE shared
    // gaps-and-islands definition
    (d.filter(!col("is_eval")), Dedup.mergeIslands(iv))
  }

  /** The REMOVAL half of substring decontamination ([[decon_spans]] is the
    * audit): rebuild every TRAINING document with its eval-overlapping
    * spans cut out — the GPT-3 appendix-C treatment (they mask the
    * contaminated window; PaLM drops the doc — both start from exactly
    * these intervals). Same reassembly algebra as
    * [[Dedup.dd_spans_trim]]: positions inside any merged span drop via a
    * left-anti interval join (spans are disjoint by construction),
    * survivors rejoin in position order, and the oracle pins the md5 of
    * the actual reconstruction. Untouched training docs pass through
    * byte-exact; a fully-contaminated doc trims to the empty string; eval
    * docs are NOT emitted (they are not trainable content — the release
    * corpus is the training slice).
    *
    * Scale shape: [[decon_spans]]' broadcast probe + one doc_id shuffle,
    * then the word-level explode/anti-join/reassembly — linear in corpus
    * tokens with per-doc bounded groups, the dd_spans_trim bound.
    */
  def decon_spans_trim(s: SparkSession, dir: String, k: Int = 8,
      evalMod: Int = 3): DataFrame = {
    val (d, spans) = deconSpanFrames(s, dir, k, evalMod)
    Dedup.trimBySpans(d, spans)
  }

  /** Data card: the per-(lang, source) release summary every corpus ships
    * with — doc/char/word volumes, median document length, exact-duplicate
    * count (docs minus distinct digests), and the Gopher-quality pass
    * count, in ONE aggregate over one corpus scan. All components reuse
    * the library's shared definitions ([[TextAnalysis.gopherCriteria]],
    * the md5 digest [[Dedup.dd_exact]] groups on), so the card can never
    * disagree with the operators it summarizes. Scale shape: a single
    * shuffle on (lang, source); count_distinct expands to the standard
    * two-phase aggregate; the percentile is per-group exact — at 100 TB
    * each group's sorted buffer is its own doc-length list, the one
    * component to swap for an approx sketch if groups reach billions.
    */
  def pipeline_card(s: SparkSession, dir: String): DataFrame = {
    val (okCount, okMean, okStops) = TextAnalysis.gopherCriteria()
    docs(s, dir)
      .select(col("lang"), col("source"),
        length(col("text")).cast("long").as("len"),
        size(words(col("text"))).cast("long").as("nw"),
        md5(col("text")).as("digest"),
        (okCount && okMean && okStops).as("keep"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("n_chars"),
        sum(col("nw")).as("n_words"),
        percentile(col("nw"), lit(0.5)).as("p50_words"),
        (count(lit(1)) - count_distinct(col("digest"))).as("n_dup_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_ok"))
      .orderBy("lang", "source")
  }

  /** Column PROFILE — the generic data-quality census (row count, null
    * count, exact distinct cardinality per column) every ingest audit
    * starts with, in ONE scan + one aggregate: all per-column counters
    * ride a single aggregate row that unpivots to the long
    * (column, stats) layout via stack — N profiled columns never mean N
    * scans. Each count_distinct expands to Spark's standard two-phase
    * distinct aggregate; at billions of distincts per column swap in
    * approx_count_distinct (the ev_hll argument). The DuckDB twin is the
    * per-column UNION ALL spelling of the same counters.
    */
  def profile_table(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val agged = docs(s, dir).agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        // coalesce: sum over zero rows is NULL — an empty table must
        // census as integer zeros, not NULL-propagating counters
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"))): _*)
    val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    agged.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"))
      .orderBy("col_name")
  }

  /** Corpus snapshot DIFF — the release-to-release changelog a versioned
    * dataset publishes (docs added / removed / changed / unchanged), the
    * audit that catches silent regeneration drift between releases. The
    * façade derives the "v2" snapshot deterministically from the corpus
    * (the [[graft.operators.Dedup.dd_incremental]] residue device, so the
    * DuckDB twin reproduces it exactly): doc_id % 10 == 0 is dropped,
    * % 10 == 1 is edited (a suffix append), % 10 == 2 additionally ships a
    * fresh copy under a new id. Presence is tracked with explicit flags —
    * NOT digest nullness, which would misclassify a null-text doc as
    * absent — and both-present docs compare digests null-safely.
    *
    * Scale shape: one full-outer shuffle join on doc_id carrying a 32-char
    * digest per row (text never crosses the shuffle), then a census
    * aggregate whose output is ≤ 4 rows. At 100 TB this is the cheapest
    * possible diff: both sides scan once, project (id, digest), join.
    */
  /** The deterministic "second snapshot" plant shared by [[rel_diff]] and
    * [[profile_drift]] (and their DuckDB twins, via one SQL fragment):
    * residue 0 dropped (removals), residue 1 edited (append " [v2]"),
    * residue 2 duplicated under +10⁹ ids (additions) — every diff class
    * exercised from one deterministic derivation.
    */
  private def driftV2(base: DataFrame): DataFrame = {
    val res = pmod(col("doc_id"), lit(10))
    base.filter(res =!= 0)
      .select(col("doc_id"),
        when(res === 1, concat(col("text"), lit(" [v2]")))
          .otherwise(col("text")).as("text"),
        col("lang"))
      .unionByName(base.filter(res === 2)
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("text"),
          col("lang")))
  }

  def rel_diff(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
    val v1 = base.select(col("doc_id"), md5(col("text")).as("d1"),
      lit(true).as("in1"))
    val v2 = driftV2(base)
      .select(col("doc_id"), md5(col("text")).as("d2"), lit(true).as("in2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in1").isNull, "added")
          .when(col("in2").isNull, "removed")
          .when(col("d1") <=> col("d2"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("status")
  }

  /** The per-document (feature, bucket) rows behind [[profile_drift]]'s
    * censuses — ONE definition shared with the streaming
    * [[graft.streaming.DocsStream.driftStream]] monitor, so the batch
    * shift report and the ingest-edge counts can never bucket
    * differently. Buckets are null-guarded into sentinel strings (a
    * full-outer equi join drops null keys silently).
    */
  private[graft] def driftFeatures(v: DataFrame): DataFrame =
    v.select(explode(array(
        struct(lit("lang").as("feature"),
          coalesce(col("lang"), lit("(null)")).as("bucket")),
        struct(lit("len_c").as("feature"),
          coalesce(expr("length(text) div 100"), lit(-1))
            .cast("string").as("bucket")))).as("fb"))
      .select(col("fb.feature").as("feature"), col("fb.bucket").as("bucket"))

  /** DISTRIBUTION-SHIFT census between two corpus snapshots — the
    * rel_diff companion every crawl-over-crawl pipeline runs before
    * retraining on a new snapshot: per feature (language; text-length
    * century), the bucket's document count and corpus SHARE in each
    * snapshot plus the signed share delta, all in integer
    * parts-per-million (`(n·10⁶) div N` — exact, so the census is a full
    * hash oracle; Σ|delta_ppm|/2 over a feature is the total-variation
    * distance in ppm, the standard shift statistic, derivable from the
    * emitted rows without a float log anywhere — the same
    * no-float-summation stance as samp_importance's integer DSIR). The
    * second snapshot is the [[driftV2]] plant rel_diff diffs, so both
    * operators describe the SAME pair of corpora from two angles:
    * row-identity churn there, distribution movement here.
    *
    * Scale shape: one scan per snapshot (the two feature censuses ride
    * one explode), map-side-combined group-bys whose output is
    * bucket-cardinality; the share window partitions by feature over
    * that census frame, never the corpus. Buckets are null-guarded into
    * sentinel strings because a full-outer equi join drops null keys
    * silently.
    */
  def profile_drift(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
    def census(v: DataFrame): DataFrame =
      driftFeatures(v).groupBy("feature", "bucket").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("feature")
    census(base).withColumnRenamed("n", "n1")
      .join(census(driftV2(base)).withColumnRenamed("n", "n2"),
        Seq("feature", "bucket"), "full_outer")
      .select(col("feature"), col("bucket"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
      .withColumn("s1", sum(col("n1")).over(w))
      .withColumn("s2", sum(col("n2")).over(w))
      .withColumn("share1_ppm", expr("(n1 * 1000000) div s1"))
      .withColumn("share2_ppm", expr("(n2 * 1000000) div s2"))
      .withColumn("delta_ppm", col("share1_ppm") - col("share2_ppm"))
      .select("feature", "bucket", "n1", "n2",
        "share1_ppm", "share2_ppm", "delta_ppm")
      .orderBy("feature", "bucket")
  }

  /** Hashed-bigram IMPORTANCE scoring in the DSIR spirit (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"): score
    * each document by how much its own n-gram distribution resembles a
    * TARGET slice of the corpus (here `lang = targetLang`) versus the raw
    * corpus, over `16^hexChars` hashed buckets. DSIR proper scores with a
    * log-likelihood ratio; summed floats hash-differently across engines,
    * so this keeps the two sides of the ratio as EXACT INTEGER sums —
    * `score_num` = Σ_b c_d(b)·n_target(b), `score_den` = Σ_b c_d(b)·n_raw(b)
    * (the doc's own bucket mass weighted by target vs raw bucket
    * frequency) — and the final `score` is their single IEEE division,
    * bit-identical in any engine. Selection = top-`k` by (score, doc_id).
    *
    * Scale shape: two passes over the bigram stream (corpus bucket stats,
    * then per-doc bucket counts — the DSIR estimate/score split), both
    * map-side-combined group-bys; the stats table is `16^hexChars` rows and
    * broadcast into the scoring join, so the corpus-sized side never
    * reshuffles for it. Buckets are md5-prefix strings — no numeric
    * conversion, so the DuckDB twin is the same three characters.
    */
  def samp_importance(s: SparkSession, dir: String, targetLang: String = "en",
      hexChars: Int = 3, k: Int = 50): DataFrame = {
    val grams = docs(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(shingles(col("text"), 2)).as("gram"))
      .withColumn("b", substring(md5(col("gram")), 1, hexChars))
    val stats = grams.groupBy("b").agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("n_target"))
    grams.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .join(broadcast(stats), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("c") * col("n_target")).as("score_num"),
        sum(col("c") * col("n_raw")).as("score_den"))
      .withColumn("score",
        col("score_num").cast("double") / col("score_den").cast("double"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** DSIR in the PUBLISHED form (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): log importance weight
    * λ_d = Σ_b c_d(b)·(log p̂_tgt(b) − log p̂_raw(b)) over hashed-bigram
    * buckets with add-1 smoothing, then GUMBEL TOP-K resampling — the
    * paper's sampling-without-replacement ∝ exp(λ), not a plain top-λ
    * cut. [[samp_importance]] keeps its integer-ratio HEURISTIC form
    * (its scaladoc's "summed floats hash-differently" rationale); this
    * operator removes that compromise with round 16's fixed-point log:
    * every log₂ is the pinned [[TextAnalysis.log2Fp]] recurrence
    * (in-plan via [[TextAnalysis.log2FpSql]]), so the published algebra
    * is EXACT INTEGERS end to end and the DuckDB twin is a full hash
    * oracle.
    *
    *  - λ_fp(d) = Σ_b c_d(b)·[lg(n_tgt(b)+1) − lg(n_raw(b)+1)]
    *            + n_d·[lg(T_raw+B) − lg(T_tgt+B)], all in 2⁻²⁰ units
    *    (lg = log2Fp; B = 16^hexChars smoothing buckets; n_d = Σ_b c_d).
    *  - Gumbel keys in base 2: u_d = (h_d+1)/2²⁰ from 5 md5 hex chars of
    *    `doc_id|dsir42`; g_d = −log₂(−log₂ u_d) computed as
    *    20·2²⁰ − lg(max(1, 20·2²⁰ − lg(h_d+1))) — the max(1,·) clamp is
    *    the u=1 lattice point whose true Gumbel key is +∞ (p = 2⁻²⁰ per
    *    doc; the clamp caps it at the lattice maximum instead). Base-2
    *    Gumbel with base-2 log-weights IS the published distribution:
    *    argtop-k(λ + G/ln2 + c) = argtop-k(λ·ln2 + G), i.e. exactly
    *    P(d) ∝ 2^λ_d = w_d (the Gumbel-max trick is invariant under the
    *    common positive-affine transform; Vieira 2014's top-k form).
    *  - Selection: top-`k` by (λ_fp + g_fp, doc_id) — deterministic,
    *    engine-independent, yet distributionally the paper's resample
    *    (u is a 2²⁰-point lattice, quantization ~10⁻⁶ of a bit).
    *
    * Scale shape: the same two map-side-combined passes over the bigram
    * stream as [[samp_importance]] (bucket stats, then per-doc bucket
    * counts); the stats-with-weights table is 16^hexChars rows with its
    * logs computed IN-PLAN (never a driver collect — at hexChars = 6
    * that table is 16M rows), broadcast into the scoring join; the
    * totals are the tx_bm25 one-driver-row pattern. BIGINT bounds:
    * |wt| < 33·2²⁰, so Σ c·wt < 3.5·10⁷·dl — safe past 10¹¹ tokens/doc;
    * log2FpSql's own in-plan guard enforces T_raw+B < 2³³ (~8.6 G
    * bigrams; past that widen the recurrence to DECIMAL, the tx_colloc
    * note's device).
    */
  /** [[samp_dsir]] defaults, shared with [[graft.OracleSql]] so the twin
    * cannot drift from the operator.
    */
  val dsirTargetLang: String = "en"
  val dsirHexChars: Int = 3
  val dsirTopK: Int = 50

  /** The DSIR weight table as a shippable VALUE — what
    * [[graft.streaming.DocsStream.dsirGate]] consumes (the
    * authorityGate/perplexityGate per-snapshot-artifact contract: train
    * on the released corpus, gate the incoming stream; restart the query
    * to pick up a retrain). `wt` maps each OBSERVED bucket to
    * lg(n_tgt+1) − lg(n_raw+1); a bucket the training corpus never
    * produced is exactly the add-1-smoothed zero (lg 1 − lg 1), so the
    * gate's getOrElse(0) is the principled value, not a fallback — the
    * batch operator can never hit that path (its docs ARE the corpus),
    * the stream edge can.
    */
  final case class DsirWeights(wt: Map[String, Long], constFp: Long,
      hexChars: Int)

  def dsirGateArtifact(s: SparkSession, dir: String,
      targetLang: String = dsirTargetLang,
      hexChars: Int = dsirHexChars): DsirWeights = {
    import graft.operators.TextAnalysis.log2Fp
    require(hexChars >= 1 && hexChars <= 5,
      s"dsirGateArtifact: hexChars=$hexChars — 16^$hexChars buckets is no " +
        "longer a table you ship to the ingest tier as a value; train a " +
        "coarser feature space (the batch samp_dsir screen has no such cap)")
    val stats = dsirStats(docs(s, dir), targetLang, hexChars).collect()
    val (tRaw, tTgt) = (stats.map(_.getLong(1)).sum, stats.map(_.getLong(2)).sum)
    require(tRaw > 0L, "dsirGateArtifact: no scoreable documents")
    require(tTgt > 0L,
      s"dsirGateArtifact: target slice lang='$targetLang' is empty — the " +
        "target feature distribution is undefined; fix the target language")
    val b = math.pow(16, hexChars).toLong
    DsirWeights(
      stats.map(r => r.getString(0) ->
        (log2Fp(r.getLong(2) + 1L, 1L) - log2Fp(r.getLong(1) + 1L, 1L))).toMap,
      log2Fp(tRaw + b, 1L) - log2Fp(tTgt + b, 1L),
      hexChars)
  }

  /** PERSIST the DSIR weight table — the production artifact step the
    * gate's restart-to-retrain contract presumes (the
    * [[graft.operators.TextAnalysis.writeLangidWeights]] discipline):
    * train once per corpus snapshot, write the (bucket, weight) table
    * next to the snapshot, ship the loaded [[DsirWeights]] to the ingest
    * tier. The smoothing constant and the bucket width ride as sentinel
    * rows (`__const__`, `__hexchars__` — real buckets are 1–5 lowercase
    * hex chars, so the sentinels cannot collide). Write-then-swap
    * ([[graft.AtomicSwap]]): only a complete artifact replaces the live
    * one.
    */
  def writeDsirWeights(s: SparkSession, dir: String, path: String,
      targetLang: String = dsirTargetLang,
      hexChars: Int = dsirHexChars): Unit = {
    import s.implicits._
    val w = dsirGateArtifact(s, dir, targetLang, hexChars)
    val df = (w.wt.toSeq.sortBy(_._1) ++
        Seq(("__const__", w.constFp), ("__hexchars__", w.hexChars.toLong)))
      .toDF("bucket", "weight")
    val dest = new org.apache.hadoop.fs.Path(path)
    val fs = dest.getFileSystem(s.sparkContext.hadoopConfiguration)
    graft.AtomicSwap.writeThenSwap(fs, dest, "writeDsirWeights") { staging =>
      df.write.mode("overwrite").parquet(staging.toString)
    }
  }

  /** Load a [[writeDsirWeights]] artifact back into the [[DsirWeights]]
    * the streaming gate consumes. Fails loudly on a malformed table — a
    * truncated weight set would silently shift every document's λ toward
    * the smoothed zero, and a lost sentinel row would leave the gate
    * without its smoothing constant or bucket width.
    */
  def readDsirWeights(s: SparkSession, path: String): DsirWeights = {
    val rows = s.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val m = rows.toMap
    require(rows.length == m.size,
      s"readDsirWeights: $path carries duplicate bucket rows — the " +
        "artifact is corrupt")
    for (sentinel <- Seq("__const__", "__hexchars__"))
      require(m.contains(sentinel),
        s"readDsirWeights: $path has no '$sentinel' row — the artifact " +
          "is truncated or from an incompatible version")
    val hex = m("__hexchars__")
    require(hex >= 1L && hex <= 5L,
      s"readDsirWeights: $path declares hexChars=$hex — expected 1..5; " +
        "the artifact is corrupt or from an incompatible version")
    val wt = m - "__const__" - "__hexchars__"
    require(wt.nonEmpty,
      s"readDsirWeights: $path carries no weight rows — the artifact is " +
        "truncated")
    val bad = wt.keys.filterNot(b =>
      b.length == hex.toInt && b.forall(c => (c >= '0' && c <= '9') ||
        (c >= 'a' && c <= 'f')))
    require(bad.isEmpty,
      s"readDsirWeights: $path carries buckets ${bad.take(3).mkString(",")} " +
        s"that are not $hex-char lowercase hex — the artifact is corrupt " +
        "or was trained at a different bucket width")
    DsirWeights(wt, m("__const__"), hex.toInt)
  }

  /** (b, n_raw, n_tgt) bucket census — the ONE feature/count definition
    * shared by [[samp_dsir]] and [[dsirGateArtifact]] so the batch screen
    * and the gate artifact cannot bucket or count differently.
    */
  private def dsirStats(d: DataFrame, targetLang: String,
      hexChars: Int): DataFrame =
    d.filter(col("text").isNotNull)
      .select(col("lang"), explode(shingles(col("text"), 2)).as("gram"))
      .withColumn("b", substring(md5(col("gram")), 1, hexChars))
      .groupBy("b").agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("n_tgt"))
      .select("b", "n_raw", "n_tgt")

  def samp_dsir(s: SparkSession, dir: String, targetLang: String = dsirTargetLang,
      hexChars: Int = dsirHexChars, k: Int = dsirTopK): DataFrame = {
    import graft.operators.TextAnalysis.{log2Fp, log2FpSql}
    require(k >= 1, s"samp_dsir: k=$k must be >= 1")
    require(hexChars >= 1 && hexChars <= 7,
      s"samp_dsir: hexChars=$hexChars outside [1,7] (16^8 overflows the " +
        "useful bucket range and 0 would put every gram in one bucket)")
    val b = math.pow(16, hexChars).toLong
    val grams = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(shingles(col("text"), 2)).as("gram"))
      .withColumn("b", substring(md5(col("gram")), 1, hexChars))
    // the bucket census is materialized ONCE (lineage cut — the pagerank
    // façade device): it has two consumers (the per-bucket weights and
    // the totals/constant aggregate), and without the cut each consumer
    // re-runs the corpus-sized explode+aggregate inside the final plan
    // (measured: zero AQE stage reuse across the two subtrees). The
    // checkpointed frame is 16^hexChars rows — the materialization job
    // IS the census, paid exactly once.
    val stats = {
      import graft.Checkpoints.DatasetCheckpointOps
      dsirStats(docs(s, dir), targetLang, hexChars).graftCheckpoint()
    }
    // totals + smoothing constant stay IN-PLAN (the twin's tot CTE
    // shape); the empty-target refusal rides in-plan too (the decon_bm25
    // bounded-guard device) — raise_error, not require, because the
    // totals never visit the driver.
    // Column-form raise_error (the bm25Gate spelling) — targetLang never
    // enters a SQL string, so a quote in it cannot break parsing
    val cons = stats.agg(sum("n_raw").as("t_raw"), sum("n_tgt").as("t_tgt"))
      .select(when(col("t_raw").isNull || col("t_raw") <= 0L,
          raise_error(lit("samp_dsir: no scoreable documents — nothing " +
            "to select from")).cast("long"))
        .when(col("t_tgt").isNull || col("t_tgt") <= 0L,
          raise_error(lit(s"samp_dsir: target slice lang='$targetLang' " +
            "is empty — the target feature distribution is undefined; " +
            "fix the target language")).cast("long"))
        .otherwise(expr(log2FpSql(s"t_raw + ${b}L")) -
          expr(log2FpSql(s"t_tgt + ${b}L"))).as("const_fp"))
    // per-bucket log-weights stay IN-PLAN and distributed
    val wts = stats.select(col("b"),
      (expr(log2FpSql("n_tgt + 1")) - expr(log2FpSql("n_raw + 1"))).as("wt"))
    // broadcast only while the bucket table is provably small: 16^5 ≈ 1M
    // rows × ~24 B is comfortably under Spark's broadcast limits, but
    // hexChars 6–7 (up to 16^7 ≈ 268M observed buckets on a diverse
    // corpus) could OOM the driver under a forced hint — there AQE picks
    // the strategy from the census's real size (the gate artifact caps
    // hexChars at 5 for the same reason).
    val wtsSide = if (hexChars <= 5) broadcast(wts) else wts
    grams.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .join(wtsSide, Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("c") * col("wt")).as("wsum"), sum(col("c")).as("nd"))
      .crossJoin(broadcast(cons))
      .withColumn("lambda_fp", col("wsum") + col("nd") * col("const_fp"))
      .withColumn("h1", conv(substring(md5(concat(
          col("doc_id").cast("string"), lit("|dsir42"))), 1, 5), 16, 10)
        .cast("long") + 1L)
      .withColumn("a_fp",
        greatest(lit(1L), lit(20L << 20) - expr(log2FpSql("h1"))))
      .withColumn("gumbel_fp", lit(20L << 20) - expr(log2FpSql("a_fp")))
      .withColumn("key_fp", col("lambda_fp") + col("gumbel_fp"))
      .select("doc_id", "lambda_fp", "gumbel_fp", "key_fp")
      .orderBy(col("key_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** Reproducible GLOBAL SHUFFLE for training order — every run must feed
    * the trainer the identical document order (loss curves are compared
    * across runs), yet a true global sort by random key is the classic
    * scale trap (one total order = one massive range exchange, and a
    * global row_number is a single-partition window). The scalable
    * spelling: shard by a hash prefix (content-free — doc_id + a fixed
    * tag, so re-crawled text does not move a doc), position WITHIN the
    * shard by hash order — the per-shard windows run in parallel, and
    * consuming shards round-robin reproduces one global pseudo-random
    * order. Deterministic across engines, runs, and partitionings (the
    * hexThr/md5 family's argument). Emits (doc_id, shard, pos).
    */
  def samp_shuffle(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    require(nShards >= 1, s"samp_shuffle: nShards=$nShards must be positive")
    val h = md5(concat(col("doc_id").cast("string"), lit("|shuffle42")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(conv(substring(col("h"), 1, 6), 16, 10)
        .cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** QUALITY-CURRICULUM training order (Bengio et al. 2009 applied the
    * way LLM data schedules actually use it — phase the corpus by a
    * quality score and feed phases in order, annealing toward the best
    * slice): phase = quartile of the length-normalized scorer margin (the
    * SAME [[TextAnalysis.scoreRawCol]] the screens use — phase 0 is the
    * top quartile), and WITHIN a phase the reproducible content-addressed
    * shard/position order of [[samp_shuffle]] (per-(phase, shard) windows —
    * never a global sort). The quartile cut points are exact percentiles,
    * bit-matched by DuckDB's quantile_cont (the q30 precedent), collected
    * as THREE doubles (the bounded-driver rule). Consumers read phases in
    * either direction; the frame just pins the deterministic order.
    */
  def samp_curriculum(s: SparkSession, dir: String, nShards: Int = 8): DataFrame =
    curriculumFrame(curriculumQualitySignal(s, dir), "doc_id", nShards)

  /** [[samp_curriculum]]'s (doc_id, signal) scored frame — ONE
    * definition shared with the composed schedule
    * ([[Clustering.samp_curriculum_mixed]]), so a document's quality
    * quartile cannot differ between the standalone and composed faces.
    */
  private[operators] def curriculumQualitySignal(s: SparkSession,
      dir: String): DataFrame =
    docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), shingles(col("text"), 2).as("gs"))
      .select(col("doc_id"),
        (TextAnalysis.scoreRawCol(col("gs")).cast("double") /
          size(col("gs")).cast("double")).as("signal"))

  /** The ONE curriculum frame device behind [[samp_curriculum]] and
    * [[Clustering.samp_curriculum_coverage]]: exact quartile phases over
    * `signal` (phase 0 = the TOP quartile, signal ≥ p75 — quality's
    * "best first" and coverage's "farthest first" are the same cut), the
    * samp_shuffle content-addressed shard/pos windows keyed on `idCol`,
    * and the (id, phase, shard, pos) output shape. One definition so the
    * two schedules' plug-compatibility contract cannot drift.
    */
  private[operators] def curriculumFrame(scored: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    // fail fast BEFORE the percentile job — curriculumWindows re-checks,
    // but by then an invalid nShards has paid a corpus aggregate
    require(nShards >= 1, s"curriculum: nShards=$nShards must be positive")
    curriculumWindows(curriculumPhases(scored, idCol), idCol, nShards)
  }

  /** The quartile-phase half of [[curriculumFrame]]: exact percentile
    * cuts over `signal` (three doubles to the driver — the bounded rule),
    * phase 0 = the TOP quartile. Exposed separately so the COMPOSED
    * schedule ([[Clustering.samp_curriculum_mixed]]) can cross two
    * families' phases while running the same cut device as each parent.
    */
  private[operators] def curriculumPhases(scored: DataFrame,
      idCol: String): DataFrame = {
    val cuts = scored
      .agg(percentile(col("signal"), typedLit(Seq(0.25, 0.5, 0.75))).as("c"))
      .first().getSeq[Double](0)
    val phase = when(col("signal") >= cuts(2), 0L)
      .when(col("signal") >= cuts(1), 1L)
      .when(col("signal") >= cuts(0), 2L).otherwise(3L)
    scored.select(col(idCol), phase.as("phase"))
  }

  /** The shard/pos half of [[curriculumFrame]]: [[samp_shuffle]]'s
    * content-addressed windows per (phase, shard) — any (id, phase)
    * frame in, the (id, phase, shard, pos) schedule out. One definition
    * so every curriculum face orders identically within a phase.
    */
  private[operators] def curriculumWindows(phased: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"curriculum: nShards=$nShards must be positive")
    val h = md5(concat(col(idCol).cast("string"), lit("|shuffle42")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("phase", "shard").orderBy(col("h"), col(idCol))
    phased.select(col(idCol), col("phase"), h.as("h"))
      .withColumn("shard", pmod(conv(substring(col("h"), 1, 6), 16, 10)
        .cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(idCol, "phase", "shard", "pos")
      .orderBy("phase", "shard", "pos")
  }

  /** Embeddings-table AUDIT — [[profile_table]]'s vector-side sibling, the
    * census an ingest runs before any ANN/cluster work: per label, vector
    * count, the dimension range (a ragged corpus breaks every fixed-width
    * operator downstream — min ≠ max is the alarm), degenerate zero-norm
    * count ([[Similarity]] guards them; this measures them), and an exact
    * fixed-point content sum (the [[Clustering]] qrow device — Σ
    * floor(x·2²⁰), order-independent integers, so the audit is a full
    * hash oracle). ONE scan, one bounded aggregate.
    */
  def profile_embeddings(s: SparkSession, dir: String): DataFrame = {
    val qrow = aggregate(col("embedding"), lit(0L),
      (acc, x) => acc + floor(x.cast("double") * (1L << 20)).cast("long"))
    val zero = array_max(transform(col("embedding"),
      x => abs(x.cast("double")))) === 0.0
    Tables.loadParallel(s, dir, "embeddings")
      .select(col("label"), size(col("embedding")).cast("long").as("dims"),
        qrow.as("q"), when(zero, 1L).otherwise(0L).as("z"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        min(col("dims")).as("dims_min"),
        max(col("dims")).as("dims_max"),
        sum(col("z")).as("n_zero_norm"),
        sum(col("q")).as("qsum"))
      .orderBy("label")
  }

  /** Epoch-schedule UPSAMPLING — the other half of [[samp_mixture]]: when a
    * source needs MORE than it has (its target share exceeds its corpus
    * share), downsampling alone cannot reach the mixture; the standard move
    * is repetition — per-source epochs e_s = (w_s/n_s)/min_t(w_t/n_t), so
    * the most over-represented source trains exactly once and everything
    * else repeats. Realized deterministically at the DOCUMENT level:
    * ⌊e_s⌋ copies for every doc plus one extra iff the doc's md5 prefix
    * falls under the fractional-part threshold — the same content-addressed
    * device as every sampler here, so the copy count of a given document
    * is reproducible under any partitioning and re-ingest. Emits the
    * per-source schedule audit (epochs, base copies, extra-copy count,
    * total realized copies); all arithmetic is divisions/floor on exact
    * IEEE doubles → full DuckDB oracle. Scale shape: one count aggregate,
    * one map-only scan with a broadcast schedule — the corpus text never
    * shuffles, and materializing the copies is a downstream `explode`
    * over a literal range, not this audit's job.
    */
  def samp_upsample(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val sched = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", mixtureWeightCol(col("source")))
      .withColumn("r", col("w") / col("n_docs").cast("double"))
      .withColumn("epochs", col("r") / min(col("r")).over(w))
      .withColumn("base", floor(col("epochs")).cast("long"))
      .withColumn("thr", hexThr(
        floor((col("epochs") - col("base")) * (1 << 24)).cast("long")))
      .select("source", "n_docs", "epochs", "base", "thr")
    d.select(col("source"), substring(md5(col("text")), 1, 6).as("p6"))
      .join(broadcast(sched), Seq("source"))
      .groupBy("source")
      .agg(first(col("n_docs")).as("n_docs"),
        first(col("epochs")).as("epochs"),
        first(col("base")).as("base"),
        first(col("thr")).as("thr"),
        sum(when(col("p6") < col("thr"), 1L).otherwise(0L)).as("n_extra"))
      .withColumn("n_total", col("base") * col("n_docs") + col("n_extra"))
      .orderBy("source")
  }

  /** Release audit — the per-SOURCE funnel composing this round's curation
    * members through their SHARED definitions: domain-AUTHORITY gate
    * ([[Graph.domainAuthority]] — the link-graph prior aggregated to the
    * registered domain; provenance screens run FIRST, before any content
    * op, the C4 order) → Gopher quality gate
    * ([[TextAnalysis.gopherCriteria]]) → learned-scorer gate
    * ([[TextAnalysis.scoreRawCol]], the tx_score margin — the CCNet/Llama
    * ordering: heuristics first, then the model screen; both map-only
    * columns on the same scan) → best-COPY exact dedup
    * ([[Dedup.dd_exact_best]]'s orderable-struct keeper: longest survivor,
    * ties to the smallest doc_id — map-side partial `max_by`, one row per
    * digest per partition over the one shuffle) → fixed-target mixture
    * sampling ([[mixtureThresholds]], computed on the DEDUPED population —
    * the production order: the cleaned census sets the rates). One row per
    * source with the count at every stage; sources erased by a stage
    * report 0, not null. Fully DuckDB-oracle-checked because every
    * component already is. Scale shape: the authority table is
    * domain-cardinality (broadcast — a left join flags rather than drops,
    * so the census can still count the gated-out raw rows), then two
    * corpus scans (the audit aggregate and the funnel), one digest
    * shuffle, broadcast thresholds; text never shuffles except the one
    * deduped keeper row per digest.
    */
  def pipeline_release(s: SparkSession, dir: String): DataFrame = {
    val (okCount, okMean, okStops) = TextAnalysis.gopherCriteria()
    val auth = Graph.domainAuthorityCached(s, dir).withColumn("auth", lit(true))
    val base = docs(s, dir)
      .select(col("doc_id"), col("source"), col("text"),
        shingles(col("text"), 2).as("gs"),
        length(col("text")).cast("long").as("len"),
        md5(col("text")).as("digest"),
        (okCount && okMean && okStops).as("keep"))
      // the learned-scorer gate (the SAME margin as [[TextAnalysis.
      // tx_score]]): heuristic gate first, then the model screen — the
      // CCNet/Llama ordering; both are map-only columns on the one scan
      .withColumn("sc_ok", TextAnalysis.scoreRawCol(col("gs")) > 0L)
      .drop("gs")
      // provenance first: the domain-authority verdict as a flag (left
      // join), so every later census column can condition on it while
      // n_raw still counts the whole corpus
      .withColumn("domain",
        TextAnalysis.urlDomain(TextAnalysis.urlPlant(col("doc_id"))))
      .join(broadcast(auth), Seq("domain"), "left")
      .withColumn("auth_ok", coalesce(col("auth"), lit(false)))
      .drop("auth", "domain")
    val q = base.filter(col("auth_ok") && col("keep") && col("sc_ok"))
    val keepers = q.groupBy("digest")
      .agg(max_by(struct(col("doc_id"), col("source"), col("text")),
        struct(col("len"), -col("doc_id"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.text").as("text"))
    val sampled = keepers
      .withColumn("p6", substring(md5(col("text")), 1, 6))
      .join(broadcast(mixtureThresholds(keepers)), Seq("source"))
      .filter(col("p6") < col("thr"))
    base.groupBy("source").agg(count(lit(1)).as("n_raw"),
        sum(when(col("auth_ok"), 1L).otherwise(0L)).as("n_auth"),
        sum(when(col("auth_ok") && col("keep"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("auth_ok") && col("keep") && col("sc_ok"), 1L)
          .otherwise(0L)).as("n_scored"))
      .join(keepers.groupBy("source").agg(count(lit(1)).as("n_dedup")),
        Seq("source"), "left")
      .join(sampled.groupBy("source").agg(count(lit(1)).as("n_release")),
        Seq("source"), "left")
      .select(col("source"), col("n_raw"), col("n_auth"), col("n_quality"),
        col("n_scored"),
        coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
        coalesce(col("n_release"), lit(0L)).as("n_release"))
      .orderBy("source")
  }

  /** The DECONTAMINATION funnel — the residue-slice screens composed into
    * one per-source census, the report a release ships next to its eval
    * results: how many training docs each screen flags ([[decon_url]]
    * provenance, [[decon_spans]] content), their union, and the clean
    * remainder. Built FROM the member operators themselves (the
    * pipeline_release convention), so the funnel and the standalone
    * screens cannot disagree on a document. The source-sliced members
    * (decon_ngram/decon_jaccard) stay out: their eval set is a different
    * universe, and a census mixing eval definitions would be incoherent.
    *
    * Scale shape: the members' own shapes (broadcast eval sides), then
    * two |flagged|-sized left joins onto the doc spine and one
    * map-side-combined census aggregate.
    */
  def pipeline_decon(s: SparkSession, dir: String, k: Int = 8,
      evalMod: Int = 3): DataFrame = {
    val urlF = decon_url(s, dir, evalMod)
      .select(col("doc_id")).distinct().withColumn("u", lit(true))
    val spanF = decon_spans(s, dir, k, evalMod)
      .select(col("doc_id")).distinct().withColumn("sp", lit(true))
    val train = docs(s, dir).filter(col("text").isNotNull)
      .filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .select(col("doc_id"), col("source"))
    train.join(urlF, Seq("doc_id"), "left").join(spanF, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_train"),
        sum(when(col("u"), 1L).otherwise(0L)).as("n_url"),
        sum(when(col("sp"), 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("u") || col("sp"), 1L).otherwise(0L)).as("n_flagged"))
      .withColumn("n_clean", col("n_train") - col("n_flagged"))
      .orderBy("source")
  }

  /** SEMANTIC benchmark decontamination — the embedding member of the
    * decon family ([[decon_ngram]] exact 8-grams, [[decon_jaccard]] fuzzy
    * n-gram sets, this one cosine): a paraphrased benchmark question
    * shares no 8-gram with its source but sits at cosine ≈ 1 in embedding
    * space, the contamination mode the lexical screens provably miss
    * (the published large-model decon recipes run both).
    *
    * Scale shape: the eval/benchmark side is small by nature (thousands
    * of rows) → broadcast; the training side is ONE map-only scan
    * computing |eval| codegen'd dots per row, then the per-vector argmax
    * partial-aggregates map-side, so the one shuffle carries at most one
    * row per training vector per partition — the 100 TB side never
    * shuffles its embeddings. Exact arithmetic end to end (the same
    * defined-order cosine as [[Dedup.dd_embed_cosine]], argmax tie-broken
    * to the smallest eval id via the sorted-struct device), hence fully
    * DuckDB-oracle-checkable where the hash-family screens are not.
    */
  def decon_embed(s: SparkSession, dir: String, nEval: Int = 64,
      threshold: Double = 0.8): DataFrame = {
    import graft.functions.VecDot
    val emb = Tables.loadParallel(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), VecDot.norm(col("embedding")).as("nrm"))
    // zero-norm guards: a degenerate (all-zero) EVAL vector would make
    // cos NaN for EVERY training row, and NaN sorts greatest in both
    // engines' struct max — one empty benchmark question would flag the
    // whole corpus contaminated, hash-matched because the oracle sorts NaN
    // the same way. Zero-norm evals are dropped (they cannot legitimately
    // contaminate); a zero-norm training vector scores -1 instead of NaN.
    val eval = emb.filter(col("vec_id") < nEval && col("nrm") > 0.0)
      .select(col("vec_id").as("e_id"), col("embedding").as("e_emb"), col("nrm").as("e_nrm"))
    // empty eval slice (nEval <= 0, or every eval vector zero-norm): the
    // crossJoin below would silently erase the audit — zero rows reads as
    // "nothing exists", not "nothing is contaminated". Emit the honest
    // frame instead: every training vector, contaminated = false. The
    // eval side is broadcast-tiny by contract, so the probe is one cheap
    // count; the oracle twin covers the non-empty case the fixture pins.
    if (eval.limit(1).count() == 0L)
      return emb.filter(col("vec_id") >= nEval)
        .select(col("vec_id"),
          lit(null).cast("long").as("best_eval"),
          lit(null).cast("double").as("max_cos"),
          lit(false).as("contaminated"))
        .orderBy("vec_id")
    emb.filter(col("vec_id") >= nEval)
      .crossJoin(broadcast(eval))
      .select(col("vec_id"),
        struct(
          when(col("nrm") === 0.0, lit(-1.0))
            .otherwise(VecDot.cosineFast(VecDot.dot(col("embedding"), col("e_emb")),
              col("nrm"), col("e_nrm"))).as("cos"),
          (-col("e_id")).as("ne")).as("sc"))
      .groupBy("vec_id")
      .agg(max(col("sc")).as("m"))
      .select(col("vec_id"),
        (-col("m.ne")).as("best_eval"),
        col("m.cos").as("max_cos"),
        (col("m.cos") >= threshold).as("contaminated"))
      .orderBy("vec_id")
  }

  /** Retrieval-based DECONTAMINATION — the fifth screen of the decon
    * family (exact n-grams, fuzzy Jaccard, embeddings, provenance — and
    * now lexical retrieval): for every eval-slice document, the top-`k`
    * training documents under BM25 where the query is the eval doc's `m`
    * most DISTINCTIVE terms (highest IDF over the training corpus; ties
    * to the lexically smaller term — the bounded-query form production
    * retrieval decon runs, since a ubiquitous term's ~0 IDF buys nothing
    * but join fan-out). The whole score is [[TextAnalysis.tx_bm25]]'s
    * exact integer arithmetic — [[TextAnalysis.log2Fp]] IDF in units of
    * 2⁻²⁰, millionths tf normalization — so the DuckDB twin is a full
    * hash oracle. Terms absent from the training corpus (df = 0) retrieve
    * nothing and are excluded before the top-`m` cut rather than wasting
    * query slots.
    *
    * Scale shape: the eval side is benchmark-scale by the decon family's
    * broadcast contract. One train-side partial aggregate (N, S, max dl);
    * one df aggregate over train postings semi-filtered to the eval
    * vocabulary; the per-term IDF table is |eval vocab|-bounded and
    * computed driver-side (same bounded-collect class as the family's
    * broadcast eval sets, guarded). Scoring is one postings aggregate
    * (broadcast-semi-pruned to query terms BEFORE the (doc, term)
    * shuffle) joined to the broadcast query table, then an eval-keyed
    * window top-k — no train-side cartesian, no corpus shuffle wider
    * than the pruned postings.
    */
  /** decon_bm25 defaults, shared with [[graft.OracleSql]] (the
    * [[TextAnalysis.bm25Query]] discipline): eval slice, query terms per
    * eval doc, retrieved training docs per eval doc.
    */
  val deconBm25EvalSource: String = "src0"
  val deconBm25M: Int = 8
  val deconBm25K: Int = 5

  /** The shared BM25-retrieval artifact of [[decon_bm25]] and the
    * streaming [[graft.streaming.DocsStream.bm25Gate]]: train-corpus
    * stats (N, S) and the per-eval-doc query table (eval_id, term,
    * idf_fp) rows after the df=0 exclusion and the top-`m` IDF cut —
    * ONE definition, so the batch screen and the ingest gate can never
    * score a document differently. Memoized per (dir, evalSource, m)
    * through [[graft.ValueMemo]] (the trainer-cache discipline: the
    * artifact is a pure function of an immutable corpus snapshot, and a
    * bench rep or a repeated screen must not re-pay the two stats/df
    * aggregates); the cached value is the m·|eval|-bounded row seq, never
    * a plan.
    */
  private val bm25ArtifactCache =
    new graft.ValueMemo[(String, String, Int), (Long, Long, Seq[(Long, String, Long)])]()

  private[graft] def bm25QueryArtifactRows(s: SparkSession, dir: String,
      evalSource: String, m: Int): (Long, Long, Seq[(Long, String, Long)]) =
    bm25ArtifactCache.getOrBuild((dir, evalSource, m)) {
      val (n, sTot, q) = bm25QueryFramesUncached(s, dir, evalSource, m)
      (n, sTot,
        q.select("eval_id", "term", "idf_fp").collect().toSeq
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
    }

  /** [[bm25QueryArtifactRows]] rebuilt as a broadcast-tiny frame — what
    * [[decon_bm25]] joins against.
    */
  private[graft] def bm25QueryFrames(s: SparkSession, dir: String,
      evalSource: String, m: Int): (Long, Long, DataFrame) = {
    val (n, sTot, rows) = bm25QueryArtifactRows(s, dir, evalSource, m)
    import s.implicits._
    (n, sTot, rows.toDF("eval_id", "term", "idf_fp"))
  }

  private def bm25QueryFramesUncached(s: SparkSession, dir: String,
      evalSource: String, m: Int): (Long, Long, DataFrame) = {
    import TextAnalysis.{bm25K1n, bm25K1d, bm25Bd}
    require(m >= 1, s"decon_bm25: m=$m query terms per eval doc must be >= 1")
    val d = docs(s, dir).filter(col("text").isNotNull)
    val train = d.filter(col("source") =!= evalSource)
      .select(col("doc_id"), words(col("text")).as("w"))
    val evalTerms = d.filter(col("source") === evalSource)
      .select(col("doc_id").as("eval_id"),
        explode(array_distinct(words(col("text")))).as("term"))
    val st = train.agg(count(lit(1)).as("n"),
      sum(size(col("w")).cast("long")).as("s"),
      max(size(col("w")).cast("long")).as("maxdl")).first()
    val n = st.getLong(0)
    require(n > 0L, "decon_bm25: no training documents — nothing to screen")
    val sTot = st.getLong(1)
    val maxDl = st.getLong(2)
    require(sTot <= Long.MaxValue / (1000000L * bm25Bd * (bm25K1n + bm25K1d)) / maxDl,
      s"decon_bm25: S=$sTot, maxdl=$maxDl exceed the BIGINT-exact range — " +
        "widen to DECIMAL")
    // df over the train corpus for the EVAL vocabulary only; the collect
    // is |eval vocab|-bounded (the benchmark side), never corpus-sized —
    // and the bound is checked IN-PLAN (one count over the aggregated df
    // frame) before any driver pull, so a misconfigured evalSource that
    // labels a corpus-scale slice "eval" refuses loudly instead of
    // OOMing the driver inside collect
    // (limit bound+1, one job: the driver pull is capped at the contract
    // bound itself, and one extra row is enough to prove the violation)
    val dfRows = train
      .select(col("doc_id"), explode(array_distinct(col("w"))).as("term"))
      .join(broadcast(evalTerms.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .limit(2000001)
      .collect()
    require(dfRows.length <= 2000000,
      s"decon_bm25: eval vocabulary has over 2000000 training-matched " +
        "terms — the eval side is benchmark-scale by the decon family's " +
        "broadcast contract; screen per benchmark release, not corpus-vs-corpus")
    import s.implicits._
    val idfDf = dfRows.toSeq.map { r =>
      (r.getString(0), TextAnalysis.log2Fp(2L * n + 2L, 2L * r.getLong(1) + 1L))
    }.toDF("term", "idf_fp")
    val evalW = org.apache.spark.sql.expressions.Window
      .partitionBy("eval_id").orderBy(col("idf_fp").desc, col("term"))
    val q = evalTerms.join(broadcast(idfDf), "term")
      .withColumn("__rk", row_number().over(evalW))
      .filter(col("__rk") <= m).drop("__rk")
    (n, sTot, q)
  }

  /** [[graft.streaming.DocsStream.bm25Gate]]'s shipped artifact — the
    * query table as driver VALUES (the authorityGate contract: benchmark
    * releases are KB-to-MB scale, the gate restarts to pick up a new
    * one): (N, S, per-eval-doc (term, idf_fp) pairs), from the SAME
    * [[bm25QueryFrames]] as the batch screen. The collect is
    * m·|eval|-bounded by construction (the top-m cut ran first).
    */
  def bm25GateArtifact(s: SparkSession, dir: String,
      evalSource: String = deconBm25EvalSource,
      m: Int = deconBm25M): (Long, Long, Seq[(Long, Seq[(String, Long)])]) = {
    val (n, sTot, rows) = bm25QueryArtifactRows(s, dir, evalSource, m)
    val queries = rows
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (e, ts) => (e, ts.sortBy(_._2).map(t => (t._2, t._3)).toSeq) }
    (n, sTot, queries)
  }

  def decon_bm25(s: SparkSession, dir: String,
      evalSource: String = deconBm25EvalSource,
      m: Int = deconBm25M, k: Int = deconBm25K): DataFrame = {
    import TextAnalysis.{bm25K1n, bm25K1d, bm25Bn, bm25Bd}
    require(k >= 1, s"decon_bm25: k=$k retrieved docs per eval doc must be >= 1")
    val (n, sTot, q) = bm25QueryFrames(s, dir, evalSource, m)
    val train = docs(s, dir).filter(col("text").isNotNull)
      .filter(col("source") =!= evalSource)
      .select(col("doc_id"), words(col("text")).as("w"))
    val postings = train
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(q.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val ppm = expr(
      s"(1000000L * ${bm25Bd * (bm25K1n + bm25K1d)}L * ${sTot}L * tf)" +
        s" div (${bm25K1d * bm25Bd * sTot}L * tf" +
        s" + ${bm25K1n * (bm25Bd - bm25Bn) * sTot}L + ${bm25K1n * bm25Bn * n}L * dl)")
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("eval_id").orderBy(col("score_fp").desc, col("doc_id"))
    postings.join(broadcast(q), "term")
      .groupBy(col("eval_id"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("idf_fp") * ppm).as("score_fp"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select("eval_id", "doc_id", "dl", "n_terms", "score_fp", "rank")
      .orderBy("eval_id", "rank")
  }
}
