package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Deterministic k-means invariants: the assignment step is pinned by the
  * DuckDB oracle (embed_kmeans_assign); these cover what the oracle can't —
  * the iterative fixed-point behavior.
  */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("kmeans is bit-deterministic across runs and partitionings") {
    val a = Clustering.embed_kmeans(spark, dir, k = 6, iters = 3)
      .collect().map(_.toSeq).toSeq
    val e = Tables.loadParallel(spark, dir, "embeddings").repartition(13)
    val b = Clustering.kmeansRounds(e, k = 6, iters = 3)
      .last._2.collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.map(_.head).toSet.subsetOf((0 until 6).toSet))
  }

  test("Lloyd invariant: inertia is non-increasing across iterations") {
    val e = Tables.loadParallel(spark, dir, "embeddings")
    val inertias = Clustering.kmeansRounds(e, k = 6, iters = 4, traceInertia = true).map(_._1)
    // centroids are fixed-point-rounded means (≤ 2^-20 per component), so
    // allow that rounding's worth of slack on the comparison
    inertias.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + (prev / 1000000L).max(16L),
        s"inertia must not increase: $inertias")
    }
    assert(inertias.last < inertias.head, "four rounds must actually improve the init")
  }

  test("every cluster summary row is consistent: sizes sum to the corpus") {
    val rows = Clustering.embed_kmeans(spark, dir, k = 6, iters = 2).collect()
    val total = Tables.loadParallel(spark, dir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("assign step: one shuffle-free map pass + bounded-domain aggregate") {
    val p = Clustering.embed_kmeans_assign(spark, dir)
      .queryExecution.sparkPlan.toString
    // centroid table is plan-literal: no join at all, just scan → project →
    // partial agg → exchange(k rows) → final agg
    assert(!p.contains("Join"), s"assignment must not plan a join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side partials required")
  }
}
