package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The persisted component/cluster label artifacts
  * ([[graft.LabelArtifact]] via Graph.writeCcLabels / Dedup
  * .writeDdCluster): round-trips are exact, the loader-fed splitter
  * equals the in-session spelling, and corrupt/truncated/foreign
  * artifacts refuse loudly instead of mis-splitting downstream.
  */
class LabelArtifactSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("artifact").toString

  test("ccLabels artifact: round-trip is exact, params stamped, splitter parity via the loader") {
    val path = tmp("graft-cclabels")
    Graph.writeCcLabels(spark, dir, path)
    val want = Graph.ccLabels(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = Graph.readCcLabels(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want, "the loaded frame must equal the built frame")
    val meta = graft.LabelArtifact.readMeta(spark, path, "spec")
    assert(meta("kind") == "cc_labels" && meta("iters") == "12" &&
      meta("all_families") == "false", s"provenance stamps: $meta")
    // the production splitter path: loader-fed == in-session memo-fed
    val inSession = Curation.samp_split_leakfree_graph(spark, dir)
      .collect().map(_.toSeq).toSeq
    val loaderFed = Curation.samp_split_leakfree_graph_from(
        spark, dir, Graph.readCcLabels(spark, path))
      .collect().map(_.toSeq).toSeq
    assert(loaderFed == inSession,
      "the loader-fed splitter must decide exactly like the in-session one")
    // overwrite-in-place is replay, not loss (write-then-swap lands whole)
    Graph.writeCcLabels(spark, dir, path)
    assert(Graph.readCcLabels(spark, path).count() == want.size)
  }

  test("dd_cluster artifact: round-trip is exact including the absent-singleton contract") {
    val path = tmp("graft-ddcluster")
    Dedup.writeDdCluster(spark, dir, path)
    val want = Dedup.dd_cluster(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = Dedup.readDdCluster(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
    assert(want.nonEmpty, "vacuous round-trip: the corpus plants near-dups")
    val meta = graft.LabelArtifact.readMeta(spark, path, "spec")
    assert(meta("kind") == "dd_cluster" && meta("threshold") == "0.5")
    // kind guard: the two families' artifacts must not cross-load
    val e = intercept[IllegalArgumentException] {
      Graph.readCcLabels(spark, path)
    }
    assert(e.getMessage.contains("'dd_cluster'"))
  }

  test("loader refusals: truncation, min-label violations, orphan labels, missing meta") {
    // truncation: rewrite labels/ with one row missing (what a lost
    // part-file does to a multi-file artifact) → row count off the stamp
    val path = tmp("graft-cctrunc")
    Graph.writeCcLabels(spark, dir, path)
    val full = spark.read.parquet(s"$path/labels")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // keep every self-labeled root so only the COUNT check can fire
    val dropped = full.filter(p => p._1 != p._2).head
    val truncated = full.filterNot(_ == dropped)
    spark.createDataset(truncated).toDF("doc_id", "component")
      .write.mode("overwrite").parquet(s"$path/labels")
    val e1 = intercept[IllegalArgumentException] {
      Graph.readCcLabels(spark, path)
    }
    assert(e1.getMessage.contains("truncated"), e1.getMessage)
    // label > id is not a min-label assignment
    val bad1 = tmp("graft-ccbad1")
    graft.LabelArtifact.write(spark,
      Seq((1L, 2L), (2L, 2L)).toDF("doc_id", "component"),
      bad1, "doc_id", "component", "cc_labels", "spec")
    val e2 = intercept[IllegalArgumentException] {
      Graph.readCcLabels(spark, bad1)
    }
    assert(e2.getMessage.contains("label > id"), e2.getMessage)
    // a label that is not itself a self-labeled member
    val bad2 = tmp("graft-ccbad2")
    graft.LabelArtifact.write(spark,
      Seq((2L, 1L), (3L, 3L)).toDF("doc_id", "component"),
      bad2, "doc_id", "component", "cc_labels", "spec")
    val e3 = intercept[IllegalArgumentException] {
      Graph.readCcLabels(spark, bad2)
    }
    assert(e3.getMessage.contains("self-labeled"), e3.getMessage)
    // not an artifact at all
    val e4 = intercept[IllegalArgumentException] {
      Graph.readCcLabels(spark, Files.createTempDirectory("graft-nometa").toString)
    }
    assert(e4.getMessage.contains("no meta/"), e4.getMessage)
    // wrong column contract at write time fails before anything lands
    val e5 = intercept[IllegalArgumentException] {
      graft.LabelArtifact.write(spark,
        Seq((1L, 1L)).toDF("x", "component"),
        tmp("graft-ccbad3"), "doc_id", "component", "cc_labels", "spec")
    }
    assert(e5.getMessage.contains("expected exactly"), e5.getMessage)
  }
}
