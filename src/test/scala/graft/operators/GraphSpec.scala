package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed semantics for the link-graph family (the DuckDB oracle
  * covers the synthetic corpus; these pin the edge plant and one PageRank
  * round against pencil-and-paper arithmetic, so a mirrored-twin error in
  * the update rule cannot hide behind the hash gate).
  */
class GraphSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n contiguous docs 0..n−1 (the testdata id shape the plant relies on). */
  private def docsDir(n: Int): String = {
    val dir = Files.createTempDirectory("graftgraph").toString
    (0L until n.toLong).map(i => (i, s"doc $i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // n=4 plant, worked by hand. Hub edges i -> i%10 are ALL self-loops for
  // n <= 10 and drop; parent edges i -> i div 2; permutation (31i+7) % 4.
  // Edges: 0->3, 1->0, 1->2, 2->1 (parent and perm collide, collapse),
  // 3->1, 3->0. outdeg: 0:1, 1:2, 2:1, 3:2.
  test("graph_pagerank: one fixed-point round matches hand arithmetic, ties ordered by doc_id") {
    val dir = docsDir(4)
    // contributions (pr0 = 1_000_000 each, integer div by outdeg):
    //   v0 <- 1/2 + 3/2 = 500000 + 500000 = 1000000
    //   v1 <- 2/1 + 3/2 = 1000000 + 500000 = 1500000
    //   v2 <- 1/2 = 500000
    //   v3 <- 0/1 = 1000000
    // pr1 = 150000 + (850·sc) div 1000
    val got = Graph.graph_pagerank(spark, dir, iters = 1, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 1425000L, 2L),
      (0L, 1000000L, 1L), // pr tie with doc 3 -> smaller id first
      (3L, 1000000L, 2L),
      (2L, 575000L, 1L)))
  }

  test("graph_degrees: per-(outdeg, indeg) census matches the hand-derived 4-node classes") {
    val dir = docsDir(4)
    val got = Graph.graph_degrees(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // v0: out 1 in 2; v1: out 2 in 2; v2: out 1 in 1; v3: out 2 in 1
    assert(got == Seq(
      (1L, 1L, 1L, 2L),
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 3L),
      (2L, 2L, 1L, 1L)))
  }

  test("graph_hits: one max-normalized round matches hand arithmetic; argmax pins at 10^6") {
    val dir = docsDir(4)
    // a0 = 10⁶ each. hraw: h(0)=10⁶, h(1)=2·10⁶, h(2)=10⁶, h(3)=2·10⁶;
    // hm=2·10⁶ → h = 500000, 10⁶, 500000, 10⁶.
    // araw: a(0) = h1+h3 = 2·10⁶, a(1) = h2+h3 = 1.5·10⁶, a(2) = h1 = 10⁶,
    // a(3) = h0 = 500000; am=2·10⁶ → a = 10⁶, 750000, 500000, 250000.
    val got = Graph.graph_hits(spark, dir, iters = 1, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0L, 1000000L, 500000L),
      (1L, 750000L, 1000000L),
      (2L, 500000L, 500000L),
      (3L, 250000L, 1000000L)))
  }

  test("graph_hits on the corpus: deterministic, discriminating, hubs lead the authority ranking") {
    val dir = "/root/testdata/sf0.001"
    val a = Graph.graph_hits(spark, dir).collect()
    val b = Graph.graph_hits(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // the Zipfian hub family (ids 0..9, in-degree ~n/10) must own the
    // head of the AUTHORITY ranking — that asymmetry (vs hub scores) is
    // what HITS adds over a single centrality
    assert(a.take(5).forall(_.getLong(0) < 10L),
      "hub-family nodes must lead the authority ranking")
    // max-norm invariant: the top authority is exactly 10⁶
    assert(a.head.getLong(1) == 1000000L)
    assert(a.map(_.getLong(1)).distinct.length > 5, "a real spread")
  }

  test("graph_pagerank on the corpus: hubs dominate, ranking is skewed and deterministic") {
    val dir = "/root/testdata/sf0.001"
    val a = Graph.graph_pagerank(spark, dir).collect()
    val b = Graph.graph_pagerank(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // hub nodes (ids 0..9, in-degree ~n/10) dominate the head of the
    // ranking — the tree backbone's shallow nodes legitimately mix into
    // the lower top-20, so the pinned claim is the top five
    assert(a.take(5).forall(_.getLong(0) < 10L),
      "hub nodes must outrank the tree/permutation bulk")
    // a real spread, not a regular graph's uniform fixed point
    assert(a.map(_.getLong(1)).distinct.length > 10)
  }

  test("graph_domains: census is complete, integer-exact, and blocklist-true") {
    val dir = "/root/testdata/sf0.001"
    val rows = Graph.graph_domains(spark, dir).collect()
    // every registered domain of the 7-host pool, exactly once
    val expectedDomains = TextAnalysis.urlHosts
      .map(_.split('.').takeRight(2).mkString(".")).distinct.sorted
    assert(rows.map(_.getString(0)).toSeq == expectedDomains)
    // doc partition: the corpus has 500 docs, every doc in exactly one domain
    assert(rows.map(_.getLong(1)).sum == 500L)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) / r.getLong(1), "pr_mean = pr_sum div n_docs")
      assert(r.getBoolean(4) ==
        TextAnalysis.urlBlocklist.contains(r.getString(0)))
    }
  }

  test("domainAuthority: top half of unblocked domains by mean rank, recomputed independently") {
    val dir = "/root/testdata/sf0.001"
    val census = Graph.graph_domains(spark, dir).collect()
      .filter(!_.getBoolean(4))
      .map(r => (r.getString(0), r.getLong(3)))
    val expect = census.sortBy { case (d, m) => (-m, d) }
      .take((census.length + 1) / 2).map(_._1).toSet
    val got = Graph.domainAuthority(spark, dir).collect().map(_.getString(0)).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < census.length,
      "the gate must discriminate, not pass or fail everything")
  }

  test("graph_cc: census equals the independently-walked permutation cycles; converged at the default iters; full graph is one component") {
    // independent reference: walk the cycles of x -> (31x+7) mod n
    def cycles(n: Long): Seq[(Long, Long, Long)] = {
      val seen = scala.collection.mutable.Set.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      for (s0 <- 0L until n) if (!seen(s0)) {
        val mem = scala.collection.mutable.ArrayBuffer.empty[Long]
        var x = s0
        while (!seen(x)) { seen += x; mem += x; x = (31 * x + 7) % n }
        out += ((mem.min, mem.size.toLong, mem.max))
      }
      out.sortBy { case (c, m, _) => (-m, c) }.toSeq
    }
    for (n <- Seq(20, 36)) { // 36: gcd(31,36)=1, different cycle shape
      val dir = docsDir(n)
      val got = Graph.graph_cc(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == cycles(n.toLong), s"n=$n census diverges from the walk")
    }
    // convergence margin: one more round changes nothing (the star fixed
    // point) on the real corpus — iters=12's slack over the measured 8
    val dir = "/root/testdata/sf0.001"
    val at12 = Graph.graph_cc(spark, dir).collect().map(_.toSeq).toSeq
    val at13 = Graph.graph_cc(spark, dir, iters = 13).collect().map(_.toSeq).toSeq
    assert(at12 == at13, "census must be a fixed point at the default iters")
    assert(at12.size > 1, "the island census must discriminate (multi-component)")
    // the full planted graph (hubs + tree + permutation) is ONE component
    val full = Graph.graph_cc(spark, dir, allFamilies = true).collect()
    assert(full.length == 1 && full.head.getLong(0) == 0L,
      "the full citation plant must be connected with root 0")
    intercept[IllegalArgumentException](Graph.graph_cc(spark, dir, iters = 0))
  }

  test("ccLabels: per-doc labels equal the independently-walked cycle minima; memo hit returns the cached frame") {
    // independent reference: each doc's component is the min of its
    // (31x+7) mod n permutation cycle
    val n = 36L
    val want = {
      val lbl = scala.collection.mutable.Map.empty[Long, Long]
      val seen = scala.collection.mutable.Set.empty[Long]
      for (s0 <- 0L until n) if (!seen(s0)) {
        val mem = scala.collection.mutable.ArrayBuffer.empty[Long]
        var x = s0
        while (!seen(x)) { seen += x; mem += x; x = (31 * x + 7) % n }
        mem.foreach(m => lbl(m) = mem.min)
      }
      lbl.toMap
    }
    val d36 = docsDir(36)
    val got = Graph.ccLabels(spark, d36).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "labels diverge from the walked cycles")
    // labels <-> census membership parity on the real corpus: the census
    // aggregated from labels IS graph_cc's output
    val labels = Graph.ccLabels(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val derived = labels.groupBy(_._2).map { case (c, ms) =>
      (c, ms.size.toLong, ms.map(_._1).max)
    }.toSeq.sortBy { case (c, m, _) => (-m, c) }
    val census = Graph.graph_cc(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(derived == census, "census must aggregate the label frame")
    // memo hit: the SessionMemo hands back the SAME checkpointed frame
    // (per-snapshot artifact — the rounds run once)
    assert(Graph.ccLabels(spark, d36) eq Graph.ccLabels(spark, d36),
      "second call must be a memo hit, not a rebuild")
    intercept[IllegalArgumentException](Graph.ccLabels(spark, d36, iters = 0))
  }

  test("pipeline_release: funnel counts are monotone per source and the authority stage bites") {
    val dir = "/root/testdata/sf0.001"
    val rows = Curation.pipeline_release(spark, dir).collect()
    rows.foreach { r =>
      val Seq(raw, auth, q, sc, dd, rel) = (1 to 6).map(r.getLong)
      assert(raw >= auth && auth >= q && q >= sc && sc >= dd && dd >= rel,
        s"funnel must be monotone: $r")
    }
    val (raw, auth) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(auth > 0 && auth < raw, "authority gate neither vacuous nor total")
  }
}
