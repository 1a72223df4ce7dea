package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JsonlSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  test("jsonl round trip is lossless vs the parquet original") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graftjsonlrt").toString
    val orig = Tables.loadParallel(spark, dir, "documents")
    Jsonl.write(orig, tmp)
    val back = Jsonl.readDocuments(spark, tmp)
    assert(back.count() == orig.count())
    // order-independent full-row digest equality
    def digest(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))).first().getLong(0)
    assert(digest(back) == digest(orig))
  }

  test("PERMISSIVE read surfaces malformed lines as corrupt records, never fails") {
    val tmp = java.nio.file.Files.createTempDirectory("graftjsonlbad").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}""",
      """{"doc_id": 2, "text": "ok two", "lang": "en", "source": "s", "n_chars": 6}""",
      """{"doc_id": 3, "text": "truncated...""", // malformed JSON
      """not json at all""")
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val raw = Jsonl.read(spark, tmp, Jsonl.documentsSchema)
    assert(raw.count() == 4)
    val bad = Jsonl.corruptRecords(raw).select(col(Jsonl.CorruptCol), col("doc_id"))
      .collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"doc_id": 3, "text": "truncated...""", "not json at all"))
    val good = Jsonl.readDocuments(spark, tmp)
    // DROPMALFORMED must drop the two bad lines from count() as well
    // (no unparsed-line fast path)
    assert(good.count() == 2)
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("src_jsonl summarizes the round-tripped copy (driver-facing shape)") {
    val r = Jsonl.src_jsonl(spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    assert(r.map(_.getLong(1)).sum == 500L)
  }
}
