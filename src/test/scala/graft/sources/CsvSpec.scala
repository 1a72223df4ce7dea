package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CsvSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  test("csv round trip is lossless vs the parquet original") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graftcsvrt").toString
    val orig = Tables.loadParallel(spark, dir, "documents")
    Csv.write(orig, tmp)
    val back = Csv.readDocuments(spark, tmp)
    assert(back.count() == orig.count())
    def digest(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))).first().getLong(0)
    assert(digest(back) == digest(orig))
  }

  test("csv null protocol: null vs empty text and quoting-sensitive chars survive the round trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graftcsvnull").toString
    val rows = Seq(
      (1L, null.asInstanceOf[String], "en", "s", 0L),
      (2L, "", "en", "s", 0L),
      (3L, "a,b \"quoted\" and\nline two", "en", "s", 25L),
      (4L, "plain words", "en", "s", 11L))
    Csv.write(rows.toDF("doc_id", "text", "lang", "source", "n_chars"), tmp)
    val back = Csv.readDocuments(spark, tmp).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(back(1L) == None, "null text must come back null, not empty")
    assert(back(2L) == Some(""), "empty text must come back empty, not null")
    assert(back(3L) == Some("a,b \"quoted\" and\nline two"),
      "delimiter, quote, and newline chars must survive quoting")
    assert(back(4L) == Some("plain words"))
  }

  test("csv write refuses a corpus whose text is literally the null sentinel (the reader would null it)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftcsvsent").toString
    // a pre-existing good export must SURVIVE a refused write (the
    // write-then-swap contract: the abort lands in the staging dir)
    Csv.write(Seq((9L, "prior good export", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), tmp)
    val rows = Seq((1L, "\\N", "en", "s", 2L))
    // the guard is in-task (raise_error inside the write projection), so
    // the failure surfaces as a SparkException wrapping the message —
    // walk the cause chain for it
    val e = intercept[Exception] {
      Csv.write(rows.toDF("doc_id", "text", "lang", "source", "n_chars"), tmp)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("null sentinel"))
    val survived = Csv.readDocuments(spark, tmp).collect()
    assert(survived.length == 1 && survived(0).getString(1) == "prior good export",
      "refused write must leave the previous export intact")
    // the abort's partial staging dir is garbage and must be cleaned (the
    // staging dir is preserved ONLY when the write succeeded but the final
    // rename failed — there it holds the only complete copy)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tmp + "._staging")),
      "guard-abort must clean up its partial staging directory")
    // a doc merely CONTAINING the sentinel is fine — only full equality
    // collides with the protocol
    Csv.write(Seq((2L, "uses \\N inside", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), tmp)
    val back = Csv.readDocuments(spark, tmp).collect()
    assert(back.length == 1 && back(0).getString(1) == "uses \\N inside")
  }
}
