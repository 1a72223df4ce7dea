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
}
