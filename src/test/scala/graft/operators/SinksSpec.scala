package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{Jsonl, Sinks, Tables}

class SinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("writeShards: content-addressed, lossless, and hash-balanced") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val docs = Tables.loadParallel(spark, dir, "documents")
    Sinks.writeShards(docs, out, shards = 8)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count(), "no rows lost or duplicated")
    // shard is a pure function of content: recompute and compare
    val mismatches = back
      .filter(col("shard") =!= pmod(xxhash64(col("text")), lit(8)).cast("int"))
      .count()
    assert(mismatches == 0)
    // hash balance: with 500 docs over 8 shards no shard should be pathological
    val sizes = back.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.min > 20, s"unbalanced: ${sizes.toSeq}")
    // re-writing a REPARTITIONED corpus lands every doc in the same shard
    val out2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    Sinks.writeShards(docs.repartition(17), out2, shards = 8)
    val a = spark.read.parquet(out).select("doc_id", "shard")
    val b = spark.read.parquet(out2).select(col("doc_id"), col("shard").as("shard2"))
    assert(a.join(b, "doc_id").filter(col("shard") =!= col("shard2")).count() == 0)
  }

  test("manifest: intact release verifies clean; tampered shard is located; digest is layout-independent") {
    val out = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    val docs = Tables.loadParallel(spark, dir, "documents")
    Sinks.writeShards(docs, out, shards = 4)
    Sinks.writeManifest(spark, out)
    assert(Sinks.verifyShards(spark, out).count() == 0)
    // the corpus read must not pick the manifest up (the `_` convention)
    assert(spark.read.parquet(out).count() == docs.count())
    // digest is independent of file layout: rewrite a shard's files split
    // differently — verify stays clean
    val sh0 = spark.read.parquet(s"$out/shard=0").repartition(5)
    sh0.write.mode("overwrite").parquet(s"$out/.tmp_sh0")
    spark.read.parquet(s"$out/.tmp_sh0").coalesce(2)
      .write.mode("overwrite").parquet(s"$out/shard=0")
    assert(Sinks.verifyShards(spark, out).count() == 0)
    // tamper: drop one row from shard 2 — exactly that shard is named
    val sh2 = spark.read.parquet(s"$out/shard=2").filter(col("doc_id") =!=
      spark.read.parquet(s"$out/shard=2").agg(min("doc_id")).first().getLong(0))
    sh2.write.mode("overwrite").parquet(s"$out/.tmp_sh2")
    spark.read.parquet(s"$out/.tmp_sh2")
      .write.mode("overwrite").parquet(s"$out/shard=2")
    val bad = Sinks.verifyShards(spark, out).select("shard").collect().map(_.getInt(0))
    assert(bad.toSeq == Seq(2))
  }

  test("JSONL round-trip: values and schema survive the interchange edge") {
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.loadParallel(spark, dir, "documents")
    Sinks.writeJsonl(docs, out, shards = 4)
    // readJsonl delegates to Jsonl.read: malformed lines are VISIBLE in
    // the _corrupt column instead of becoming silent all-null rows
    val back = Sinks.readJsonl(spark, out, docs.schema)
    assert(back.schema.fieldNames.toSeq ==
      docs.schema.fieldNames.toSeq :+ Jsonl.CorruptCol)
    // a clean release round-trips clean (collect keeps doc_id referenced —
    // count() would prune to a corrupt-only scan, which Spark rejects;
    // see the Jsonl.corruptRecords docs)
    assert(Jsonl.corruptRecords(back).select("doc_id").collect().isEmpty)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = back.drop(Jsonl.CorruptCol).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("writeLayout: partition pruning + row-group stats filters on the sort column") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val docs = Tables.loadParallel(spark, dir, "documents")
    Sinks.writeLayout(docs, out, partCol = "lang", sortCol = "source")
    val q = spark.read.parquet(out)
      .filter(col("lang") === "en" && col("source") === "src3")
    val p = q.queryExecution.sparkPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"), "dir-level pruning")
    assert(p.contains("PushedFilters: [IsNotNull(source), EqualTo(source,src3)"),
      "source filter must reach the scan where sorted row-group stats apply")
    assert(q.count() > 0)
  }

  test("ensureSymlink: equivalent target spellings pass, different targets and squatters fail loud") {
    import java.nio.file.{Files, Paths}
    val stage = Files.createTempDirectory("graft-symlink")
    val targetDir = Files.createTempDirectory("graft-symlink-tgt")
    val target = targetDir.resolve("table.parquet")
    Files.createDirectory(target)
    val link = stage.resolve("table.parquet")
    Tables.ensureSymlink(link, target.toAbsolutePath)
    // idempotent re-ensure with the SAME target: fine
    Tables.ensureSymlink(link, target.toAbsolutePath)
    // equivalent-but-unnormalized spellings of the same target: fine
    Tables.ensureSymlink(link,
      targetDir.resolve(".").resolve("table.parquet"))
    Tables.ensureSymlink(link, Paths.get(target.toString + "/."))
    Tables.ensureSymlink(link,
      targetDir.resolve("..").resolve(targetDir.getFileName)
        .resolve("table.parquet"))
    // a genuinely DIFFERENT target must refuse
    val other = targetDir.resolve("other.parquet")
    Files.createDirectory(other)
    val e = intercept[IllegalArgumentException] {
      Tables.ensureSymlink(link, other.toAbsolutePath)
    }
    assert(e.getMessage.contains("already points at"))
    // a real dir squatting on the link name must refuse
    val squat = stage.resolve("squatted.parquet")
    Files.createDirectory(squat)
    val e2 = intercept[IllegalArgumentException] {
      Tables.ensureSymlink(squat, target.toAbsolutePath)
    }
    assert(e2.getMessage.contains("not a symlink"))
  }
}
