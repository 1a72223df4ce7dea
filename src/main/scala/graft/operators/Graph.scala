package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Link-graph operators — the domain-authority side of corpus curation:
  * production web corpora rank hosts/pages by link centrality before
  * content filters ever run (Common Crawl publishes harmonic/PageRank
  * centrality per domain; curation pipelines use it as a quality prior).
  *
  * The synthetic corpus has no link column, so the façade derives a
  * deterministic citation graph from doc_id arithmetic (the urlPlant /
  * rel_diff residue device — the DuckDB twin reproduces the exact edges):
  * doc i cites hub (i mod 10), parent (i div 2), and (i·31+7) mod n
  * (self-loops dropped, duplicate targets collapsed; doc_ids are
  * contiguous 0..n−1 in the testdata, so every target exists). The three
  * families give the plant the shape real link graphs have: ten Zipfian
  * hubs (in-degree ~n/10), a binary-tree backbone (depth-graded
  * in-degree), and one permutation keeping everything reachable — so the
  * rank output is a real skewed ordering, not a regular graph's uniform
  * fixed point.
  *
  * All ranking arithmetic is FIXED-POINT INTEGER (scores in millionths,
  * damping 0.85 applied as ·850 then integer-div 1000; per-edge
  * contribution is integer-div by out-degree), so every iteration is
  * bit-deterministic under any partitioning and any engine — a full hash
  * oracle over an iterative graph algorithm. Mass lost to integer floors
  * (and to dangling nodes, which this simplified PageRank does not
  * redistribute) is part of the pinned definition, exactly like the
  * fixed-point centroid updates in [[Clustering]].
  */
object Graph {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")

  /** The deterministic citation edges (src, dst) + the node spine. */
  private[operators] def plantedEdges(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = docs(s, dir).select(col("doc_id"))
    // n via an aggregate broadcast-joined onto the spine: one tiny frame,
    // no collect — the same in-plan-count shape as samp_balanced's cap
    val n = d.agg(count(lit(1)).as("n"))
    val edges = d.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"), explode(array(
        pmod(col("doc_id"), lit(10L)),
        expr("doc_id div 2"),
        pmod(col("doc_id") * 31 + 7, col("n")))).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    (d, edges)
  }

  /** PageRank over the planted citation graph, `iters` rounds of the
    * classic update pr'(v) = 0.15 + 0.85·Σ_{u→v} pr(u)/outdeg(u), spelled
    * in millionths with integer division at both divide sites. Emits the
    * top-`k` docs by final rank (ties to the smaller doc_id) with their
    * out-degrees.
    *
    * Scale shape: per iteration, ONE corpus-sized shuffle pair — the
    * edges⋈rank equi join on src, then the map-side-combined contribution
    * sum on dst; the plan is `iters` such rounds, never a driver loop over
    * rows (ranks stay distributed; nothing is collected). At 100 TB,
    * hash-partition edges by src once and every iteration's join reuses
    * that partitioning; the rank frame is |V| rows — small relative to
    * |E| — and rides the same exchange. Out-degree is computed once.
    * Lineage is cut per round ([[graft.Checkpoints]]) so iters plans don't
    * stack.
    */
  def graph_pagerank(s: SparkSession, dir: String, iters: Int = 3,
      k: Int = 20): DataFrame = {
    require(k >= 1, s"graph_pagerank: k=$k must be >= 1")
    val (pr, outdeg) = pagerankRanks(s, dir, iters)
    pr.join(outdeg.withColumnRenamed("src", "v"), Seq("v"), "left")
      .select(col("v").as("doc_id"), col("pr"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .orderBy(col("pr").desc, col("doc_id"))
      .limit(k)
  }

  /** The full converged rank frame (v, pr) + the out-degree table behind
    * [[graph_pagerank]] (its top-k) and [[graph_domains]] (its domain
    * aggregate) — the iteration loop lives exactly once.
    *
    * MEMOIZED per (session, corpus, iters) as checkpointed frames (the
    * [[graft.SessionMemo]] discipline): the converged rank stack is a
    * per-crawl-SNAPSHOT artifact in production — computed once, consumed
    * by the page-level top-k, the domain census AND the release funnel's
    * authority gate — so before this cache the same 3-iteration stack ran
    * three times per bench pass. Both returned frames are lineage-cut
    * before caching (the loop checkpoints `pr` at `i == iters`, `outdeg`
    * at build), so a hit re-reads blocks instead of re-planting.
    */
  private val rankCache = new graft.SessionMemo[(String, Int), (DataFrame, DataFrame)]
  private[operators] def pagerankRanks(s: SparkSession, dir: String,
      iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, s"pagerank: iters=$iters must be >= 1")
    rankCache.getOrBuild(s, (dir, iters))(pagerankRanksBuild(s, dir, iters))
  }

  private def pagerankRanksBuild(s: SparkSession, dir: String,
      iters: Int): (DataFrame, DataFrame) = {
    import graft.Checkpoints.DatasetCheckpointOps
    val (d, edges) = plantedEdges(s, dir)
    // outdeg is checkpointed in its own right: callers join it AFTER the
    // loop, and an un-cut lineage would re-run the whole edge plant
    // (corpus scan + distinct shuffle) for that final join
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .graftCheckpoint()
    // materialize the degree-annotated edge list ONCE: every iteration
    // joins against it, and without the cut each round would re-run the
    // corpus scan + distinct shuffle that builds the plant
    val withDeg = edges.join(outdeg, Seq("src")).graftCheckpoint()
    var pr = d.select(col("doc_id").as("v"), lit(1000000L).as("pr"))
    for (i <- 1 to iters) {
      val contrib = withDeg
        .join(pr.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), expr("pr div outdeg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("sc"))
      pr = d.select(col("doc_id").as("v"))
        .join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit(150000L) + expr("(850 * coalesce(sc, 0L)) div 1000")).as("pr"))
      // cut lineage every few rounds, not every round: the plan grows one
      // join+aggregate per round (linear, not nested), so a handful of
      // rounds plan fine as one query — while an eager checkpoint per
      // round costs a materialization job each. Every 4th round bounds
      // plan depth for large iters at a quarter of the jobs.
      if (i % 4 == 0 || i == iters) pr = pr.graftCheckpoint()
    }
    (pr, outdeg)
  }

  /** DOMAIN-level centrality census — the table Common Crawl actually
    * publishes (per-domain harmonic/PageRank centrality) and the form a
    * curation pipeline consumes: page ranks aggregated to the registered
    * domain through the ONE shared URL parse
    * ([[TextAnalysis.urlPlant]] → [[TextAnalysis.urlDomain]] — the tx_url
    * family's definitions, so the authority key and the blocklist key
    * cannot drift). Emits per domain: doc count, total and mean rank
    * (mean = integer millionths, `pr_sum div n_docs` — the fixed-point
    * convention of the rank itself), and the blocklist verdict.
    *
    * Scale shape: [[pagerankRanks]]' per-iteration shuffles, then ONE
    * map-side-combined aggregate keyed by domain (the domain column is a
    * pure function of the node id — no join to reach it); output
    * cardinality is registered-domain count (~10⁶-10⁷ on the real web),
    * never corpus-sized.
    */
  def graph_domains(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val (pr, _) = pagerankRanks(s, dir, iters)
    pr.withColumn("domain",
        TextAnalysis.urlDomain(TextAnalysis.urlPlant(col("v"))))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("pr")).as("pr_sum"))
      .withColumn("pr_mean", expr("pr_sum div n_docs"))
      .withColumn("blocked",
        col("domain").isInCollection(TextAnalysis.urlBlocklist))
      .select("domain", "n_docs", "pr_sum", "pr_mean", "blocked")
      .orderBy("domain")
  }

  /** The AUTHORIZED-domain set the release funnel gates on: blocklisted
    * domains are out (the C4 provenance screen), and of the rest only the
    * top half by mean rank pass (rank-percentile gating — the relative
    * rule survives any corpus: an absolute rank threshold would drift with
    * graph size). Ties break to the lexicographically smaller domain; the
    * cut is ⌈n/2⌉ so a lone unblocked domain still passes.
    *
    * The ranking window is global but runs over the DOMAIN census —
    * bounded by registered-domain cardinality, never corpus-sized (the
    * one frame in this family where a single-partition window is the
    * right call).
    */
  /** [[domainAuthority]] memoized per (corpus, iters) for the life of the
    * JVM (the idx_health build-once device, behind the same lock
    * discipline): in production the domain-centrality table is a
    * per-crawl-SNAPSHOT artifact — computed once, consumed by every
    * downstream run — so a funnel that re-ran the rank iterations on every
    * invocation would be the wrong shape, not just slow. The cached frame
    * is checkpointed (executor blocks, never a driver collect — the census
    * is domain-cardinality, bounded but not literal-sized at web scale).
    */
  // session-scoped memo ([[graft.SessionMemo]]): in-flight builds dedup
  // per key, dead-session entries evicted on access, LRU-bounded
  private val authCache = new graft.SessionMemo[(String, Int), DataFrame]
  private[operators] def domainAuthorityCached(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    import graft.Checkpoints.DatasetCheckpointOps
    authCache.getOrBuild(s, (dir, iters))(
      domainAuthority(s, dir, iters).graftCheckpoint())
  }

  private[graft] def domainAuthority(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val da = graph_domains(s, dir, iters).filter(!col("blocked"))
    da.withColumn("rk", row_number().over(
        Window.orderBy(col("pr_mean").desc, col("domain"))))
      .withColumn("nd", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("rk") <= expr("(nd + 1) div 2"))
      .select("domain")
  }

  /** HITS hubs & authorities over the planted citation graph (Kleinberg
    * 1999, "Authoritative sources in a hyperlinked environment") — the
    * centrality pair PageRank doesn't give: an AUTHORITY is a page good
    * pages point AT, a HUB is a page that points at good authorities; a
    * curation pipeline uses the authority side as a quality prior for
    * content and the hub side to find link-farm directories. `iters`
    * rounds of h(v) = Σ_{v→u} a(u), a(u) = Σ_{v→u} h(v), each half
    * MAX-normalized to millionths — ⌊10⁶·x/max(x)⌋, the common HITS
    * normalization spelled in integers. Max-norm (not sum-norm) is the
    * division-safety proof: the argmax lands exactly on 10⁶, so neither
    * score vector can floor to all-zeros and the next round's
    * denominator is always positive (sum-norm CAN floor a >10⁶-node
    * near-uniform vector to zeros). Emits the top-`k` docs by authority
    * (ties to the smaller doc_id) with both scores. BIGINT bound: the
    * normalization product is 10⁶·Σ_{deg} 10⁶ ≤ 10¹²·max-degree — safe
    * to ~9·10⁶ max degree, far past any web host graph's.
    *
    * Scale shape: per round, TWO corpus-sized shuffle pairs (edges⋈a by
    * dst, edges⋈h by src — HITS's extra cost over PageRank's one) plus
    * two 1-row max aggregates that re-enter the plan as broadcast joins
    * (the plantedEdges count device, never a driver collect); the edge
    * list is materialized once and both joins of every round reuse it.
    * Score frames are |V|-sized and never leave the cluster.
    */
  def graph_hits(s: SparkSession, dir: String, iters: Int = 3,
      k: Int = 20): DataFrame = {
    require(iters >= 1, s"graph_hits: iters=$iters must be >= 1")
    require(k >= 1, s"graph_hits: k=$k must be >= 1")
    val (a, h) = hitsScores(s, dir, iters)
    a.join(h, Seq("v"))
      .select(col("v").as("doc_id"), col("a").as("auth"), col("h").as("hub"))
      .orderBy(col("auth").desc, col("doc_id"))
      .limit(k)
  }

  /** The converged (authority, hub) score frames behind [[graph_hits]],
    * MEMOIZED per (session, dir, iters) like [[pagerankRanks]] — the same
    * per-crawl-SNAPSHOT artifact argument: HITS scores are computed once
    * per snapshot and read by every consumer; the final frames are
    * checkpointed inside the loop, so a hit re-reads blocks.
    */
  private val hitsCache = new graft.SessionMemo[(String, Int), (DataFrame, DataFrame)]
  private def hitsScores(s: SparkSession, dir: String,
      iters: Int): (DataFrame, DataFrame) =
    hitsCache.getOrBuild(s, (dir, iters))(hitsScoresBuild(s, dir, iters))

  private def hitsScoresBuild(s: SparkSession, dir: String,
      iters: Int): (DataFrame, DataFrame) = {
    import graft.Checkpoints.DatasetCheckpointOps
    val (d, edges0) = plantedEdges(s, dir)
    // 2·iters joins hit the edge list — cut its corpus-scan + distinct
    // lineage once (the pagerankRanks discipline)
    val edges = edges0.graftCheckpoint()
    // loud refusal on a degenerate graph (the tx_colloc/tx_perplexity
    // convention): with zero edges every hmax/amax is NULL and the
    // normalization would silently emit all-NULL scores — and the SQL
    // twin mirrors the NULLs, so the oracle could never catch it. The
    // probe is a limit-1 scan of the just-materialized checkpoint blocks,
    // not a recompute. Contract mirrored in the twin's docs
    // ([[graft.OracleSql]] graph_hits entry).
    require(!edges.isEmpty, "graph_hits: planted edge set is empty " +
      "(degenerate corpus — a 0/1-document corpus has no citation edges); " +
      "hub/authority scores are undefined, refusing to emit all-NULLs")
    val spine = d.select(col("doc_id").as("v"))
    var a = spine.select(col("v"), lit(1000000L).as("a"))
    var h = spine.select(col("v"), lit(0L).as("h"))
    for (i <- 1 to iters) {
      val hraw = edges.join(a.withColumnRenamed("v", "dst"), Seq("dst"))
        .groupBy(col("src").as("v")).agg(sum(col("a")).as("hr"))
      val hmax = hraw.agg(max(col("hr")).as("hm"))
      h = spine.join(hraw, Seq("v"), "left").crossJoin(broadcast(hmax))
        .select(col("v"), expr("(1000000 * coalesce(hr, 0L)) div hm").as("h"))
      val araw = edges.join(h.withColumnRenamed("v", "src"), Seq("src"))
        .groupBy(col("dst").as("v")).agg(sum(col("h")).as("ar"))
      val amax = araw.agg(max(col("ar")).as("am"))
      a = spine.join(araw, Seq("v"), "left").crossJoin(broadcast(amax))
        .select(col("v"), expr("(1000000 * coalesce(ar, 0L)) div am").as("a"))
      // the plan grows two join+agg pairs per round — cut on the
      // pagerankRanks cadence (every 4th round and at the end)
      if (i % 4 == 0 || i == iters) { h = h.graftCheckpoint(); a = a.graftCheckpoint() }
    }
    (a, h)
  }

  /** Degree census of the planted graph — the sanity sheet published next
    * to any centrality ranking (and the oracle anchor for the edge plant
    * itself): per (out-degree, in-degree) class, how many nodes. Both
    * degrees come from the ONE distinct edge set; nodes missing from a
    * side count 0 there.
    */
  /** The permutation family alone — [[graph_cc]]'s default subgraph (the
    * "organic citation islands" left after the hub and tree-backbone
    * families, the authority/navigation edges, are excluded). Same
    * in-plan-count device as [[plantedEdges]].
    */
  private def plantedPermEdges(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = docs(s, dir).select(col("doc_id"))
    val n = d.agg(count(lit(1)).as("n"))
    val edges = d.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        pmod(col("doc_id") * 31 + 7, col("n")).as("dst"))
      .filter(col("src") =!= col("dst"))
    (d, edges)
  }

  /** CONNECTED COMPONENTS census via the alternating large-star /
    * small-star algorithm (Kiveris et al. 2014, "Connected Components in
    * MapReduce and Beyond") — the fragmentation analysis a curation
    * pipeline runs on a citation graph after the authority hubs and
    * navigation backbone are removed: what organic citation islands
    * remain, and how big are they? Default subgraph = the planted
    * permutation family ([[plantedPermEdges]]); `allFamilies = true`
    * runs the full planted graph (one component — the connectivity pin
    * the spec asserts).
    *
    * The ALGORITHM choice is the point at scale: HashMin label
    * propagation converges in DIAMETER rounds, and the planted islands
    * are n/4-length permutation cycles — 625 propagation rounds at
    * sf0.1, unbounded at web scale. Alternating large-star (every
    * node's bigger neighbors re-hook to its minimum) / small-star
    * (smaller neighbors collapse onto the minimum) contracts every
    * component to a star in O(log n) rounds regardless of diameter —
    * measured: 6/8/9 rounds on the 50/500/5000-node plants; `iters`
    * defaults to 12 (margin over every shipped SF; the spec pins that
    * iters and iters+1 emit the identical census). Output: one row per
    * component — (component = min member id, n_members, max_member),
    * ordered by size then id. Pure id arithmetic on BIGINTs → full hash
    * oracle (twin unrolls the rounds programmatically).
    *
    * Scale shape: per round, two groupBy/join shuffle pairs over an edge
    * list that only SHRINKS (star edges replace paths; `distinct`
    * bounds it by the input edge count), then one final left join +
    * census aggregate. No driver state — the loop is `iters` fixed
    * rounds, not a collect-and-test; lineage cut every 4th round (the
    * pagerank discipline).
    *
    * iters=12 is a margin over the SHIPPED corpora, not a universal
    * bound — on a graph orders larger, a fixed round count could stop
    * short and silently under-merge. So the loop VERIFIES its own
    * convergence: if the last round was already a no-op (at the star
    * fixed point both phases are identities) the fixed point is proven
    * with one round of margin for free; otherwise ONE extra star round
    * is computed and round(edges) == edges proves/refutes the fixed
    * point DIRECTLY — a graph converging exactly at round `iters` is
    * accepted (zero margin, correct census), and only a genuinely
    * unconverged graph raises IllegalStateException naming the
    * shortfall instead of emitting a wrong census. Each comparison is
    * one signed-union aggregate over two (checkpointed, star-sized)
    * edge lists; the extra round runs only on the margin-miss path.
    *
    * The census is ONE aggregate over [[ccLabels]] (the memoized
    * per-document label frame) — the rounds run once per snapshot and
    * every consumer derives from the same materialized labels.
    */
  def graph_cc(s: SparkSession, dir: String, iters: Int = 12,
      allFamilies: Boolean = false): DataFrame =
    ccLabels(s, dir, iters, allFamilies)
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_member"))
      .orderBy(col("n_members").desc, col("component"))

  /** The per-document (doc_id, component) label frame behind [[graph_cc]]
    * — exposed as its own consumer surface: graph-scale leak-free
    * splitting anchors train/test membership on REAL link components
    * (this frame), not just n-gram cliques, and any fragmentation census
    * derives from it by one aggregate (exactly how [[graph_cc]] is now
    * spelled, so labels and census can never disagree on membership).
    *
    * MEMOIZED per (session, dir, iters, allFamilies) as a checkpointed
    * frame (the [[pagerankRanks]] discipline): component labels are a
    * per-crawl-SNAPSHOT artifact — the star-contraction rounds run once,
    * and the census, the splitter, and any future consumer re-read the
    * materialized blocks. `component` = the component's minimum member
    * id; isolated nodes label themselves.
    */
  private val ccCache = new graft.SessionMemo[(String, Int, Boolean), DataFrame]
  def ccLabels(s: SparkSession, dir: String, iters: Int = 12,
      allFamilies: Boolean = false): DataFrame = {
    require(iters >= 1, s"graph_cc: iters=$iters must be >= 1")
    ccCache.getOrBuild(s, (dir, iters, allFamilies))(
      ccLabelsBuild(s, dir, iters, allFamilies))
  }

  /** PERSIST the component label frame — the production artifact step
    * the [[ccLabels]] memo only approximates: the star-contraction
    * rounds cost seconds-to-minutes per snapshot and the SessionMemo
    * dies with the session, but the splitter
    * ([[graft.operators.Curation.samp_split_leakfree_graph_from]]) and
    * any later component consumer run in OTHER processes — they read
    * this parquet artifact the way the ingest tier reads the langid/DSIR
    * weight tables (train once per snapshot, load everywhere). Landed
    * through the shared [[graft.LabelArtifact]] discipline:
    * write-then-swap (a racing reader sees old-complete or new-complete,
    * never a mix), counts + build params stamped in a meta table, and a
    * loader that refuses truncated/tampered/foreign artifacts loudly.
    */
  def writeCcLabels(s: SparkSession, dir: String, path: String,
      iters: Int = 12, allFamilies: Boolean = false): Unit =
    graft.LabelArtifact.write(s, ccLabels(s, dir, iters, allFamilies), path,
      "doc_id", "component", kind = "cc_labels", who = "writeCcLabels",
      params = Seq("iters" -> iters.toString,
        "all_families" -> allFamilies.toString))

  /** Load a [[writeCcLabels]] artifact back as the (doc_id, component)
    * frame every [[ccLabels]] consumer takes — validated (see
    * [[graft.LabelArtifact.read]]); build provenance (iters,
    * all_families) stays auditable via [[graft.LabelArtifact.readMeta]].
    */
  def readCcLabels(s: SparkSession, path: String): DataFrame =
    graft.LabelArtifact.read(s, path, "doc_id", "component",
      kind = "cc_labels", who = "readCcLabels")

  private def ccLabelsBuild(s: SparkSession, dir: String, iters: Int,
      allFamilies: Boolean): DataFrame = {
    import graft.Checkpoints.DatasetCheckpointOps
    val (d, e0) =
      if (allFamilies) plantedEdges(s, dir) else plantedPermEdges(s, dir)
    // one alternating large-star/small-star round (canonical a<b edges in,
    // canonical distinct edges out)
    def round(edges: DataFrame): DataFrame = {
      // large-star: every neighbor v > u re-hooks to m(u) = min(N(u) ∪ u)
      val adjL = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val minL = adjL.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // no distinct here: duplicate (a, b) rows cannot change any min
      // downstream and the round-end distinct canonicalizes — the twin
      // keeps its DISTINCT (different intermediate, same output), and
      // dropping this one saves a full shuffle per round
      val lgE = adjL.join(minL, Seq("u")).filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
        .filter(col("a") =!= col("b"))
      // small-star: every neighbor v < u collapses onto min(N_<(u));
      // u itself hooks there too
      val adjS = lgE.select(col("a").as("u"), col("b").as("v"))
        .union(lgE.select(col("b").as("u"), col("a").as("v")))
      val smN = adjS.filter(col("v") < col("u"))
      val minS = smN.groupBy("u").agg(min(col("v")).as("m"))
      smN.join(minS, Seq("u")).filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .union(minS.select(col("m").as("a"), col("u").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    var edges = e0
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().graftCheckpoint()
    var prev = edges
    for (_ <- 1 to iters) {
      // cut EVERY round, unlike pagerank's every-4: a round references
      // its predecessor through both adjacency orientations and both
      // star phases (~16 subplan copies), so an uncut plan grows
      // multiplicatively, not linearly — 3 uncut rounds already plan
      // in the minutes
      prev = edges
      edges = round(edges).graftCheckpoint()
    }
    // fixed-point verification, two tiers: if the LAST loop round was
    // already a no-op (prev == edges) the fixed point is proven with
    // margin for free; otherwise ONE extra star round decides it
    // directly (round(edges) == edges ⟺ converged — the margin-miss
    // path below). Each comparison is one signed-union aggregate over
    // two already-checkpointed distinct sets: any (a, b) with a nonzero
    // sign sum is in exactly one of them.
    def edgeDrift(x: DataFrame, y: DataFrame): Long =
      x.select(col("a"), col("b"), lit(1L).as("s"))
        .unionAll(y.select(col("a"), col("b"), lit(-1L).as("s")))
        .groupBy("a", "b").agg(sum(col("s")).as("s"))
        .filter(col("s") =!= 0L).limit(1).count()
    if (edgeDrift(edges, prev) != 0) {
      // the last round still changed something — a graph converging
      // EXACTLY at round `iters` is still correct (edges is the fixed
      // point, just with zero margin), so prove/refute the fixed point
      // directly with one extra star round before failing: round(edges)
      // == edges ⟺ converged. Only the margin path pays this round.
      val next = round(edges)
      if (edgeDrift(next, edges) != 0)
        throw new IllegalStateException(
          s"graph_cc: round(edges) after $iters rounds still changes the " +
            "edge set — the census would under-merge; the graph needs " +
            "more rounds than the default (pass a larger iters, " +
            "~ceil(log2 n) + slack)")
    }
    // component label: a star member's root (min(a) guards the
    // not-yet-converged case where b still carries two hooks); roots and
    // isolated nodes label themselves. Checkpointed so a memo hit
    // re-reads blocks instead of re-running the rounds.
    val lbl = edges.groupBy(col("b").as("v")).agg(min(col("a")).as("c0"))
    d.join(lbl, d("doc_id") === lbl("v"), "left")
      .select(col("doc_id"), coalesce(col("c0"), col("doc_id")).as("component"))
      .graftCheckpoint()
  }

  def graph_degrees(s: SparkSession, dir: String): DataFrame = {
    val (d, edges) = plantedEdges(s, dir)
    val outdeg = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("outdeg"))
    val indeg = edges.groupBy(col("dst").as("v")).agg(count(lit(1)).as("indeg"))
    d.select(col("doc_id").as("v"))
      .join(outdeg, Seq("v"), "left")
      .join(indeg, Seq("v"), "left")
      .select(col("v"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        coalesce(col("indeg"), lit(0L)).as("indeg"))
      .groupBy("outdeg", "indeg")
      .agg(count(lit(1)).as("n_nodes"), min(col("v")).as("first_node"))
      .orderBy("outdeg", "indeg")
  }
}
