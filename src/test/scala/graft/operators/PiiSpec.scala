package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Controlled-input semantics for [[TextAnalysis.tx_pii]]: the DuckDB oracle
  * hash-checks the corpus run; these pin the detection/redaction contract on
  * hand-built rows where the expected answer is visible by inspection.
  */
class PiiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("pii").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("counts follow the plant congruences; multi-plant docs count each class") {
    // id 0: email only; id 9: email+phone+ssn (9%6=3 — every ssn id is a
    // multiple of 3, so ssn always co-occurs with email); id 17: phone+ip;
    // id 19: iban only (19%7=5); id 11: none
    val dir = docsDir(Seq(0L, 9L, 17L, 19L, 11L).map(id => (id, "plain words only")))
    val got = TextAnalysis.tx_pii(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getAs[Long]("n_ssns"),
          r.getAs[Long]("n_ibans"), r.getAs[Boolean]("has_pii")))).toMap
    assert(got(0L) == ((1L, 0L, 0L, 0L, 0L, true)))
    assert(got(9L) == ((1L, 1L, 0L, 1L, 0L, true)))
    assert(got(17L) == ((0L, 1L, 1L, 0L, 0L, true)))
    assert(got(19L) == ((0L, 0L, 0L, 0L, 1L, true)))
    assert(got(11L) == ((0L, 0L, 0L, 0L, 0L, false)))
  }

  test("detection finds PII already present in the text, not just plants") {
    // id 11 gets no plant; PII in the body must still be counted
    val dir = docsDir(Seq(
      (11L, "write to alice.w+dev@mail-host.org or call 555-0199 from 192.168.1.10" +
        " ssn 078-05-1120 acct DE89370400440532013000")))
    val r = TextAnalysis.tx_pii(spark, dir).collect().head
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_phones") == 1L)
    assert(r.getAs[Long]("n_ips") == 1L)
    assert(r.getAs[Long]("n_ssns") == 1L)
    assert(r.getAs[Long]("n_ibans") == 1L)
  }

  test("redaction replaces every match with its typed marker and nothing else") {
    val dir = docsDir(Seq(
      (7L, "ping bob@example.org then 555-0100 then 10.0.0.1 and 078-05-1120" +
        " plus GB29NWBK60161331926819 done")))
    val redacted = spark.read.parquet(s"$dir/documents.parquet")
      .select(TextAnalysis.piiRedact(col("text")).as("r"))
      .as[String].head()
    assert(redacted == "ping <EMAIL> then <PHONE> then <IP> and <SSN> plus <IBAN> done")
  }

  test("per-class toggle redacts only the enabled classes; unknown class fails loud") {
    val text = "bob@example.org 555-0100 10.0.0.1 078-05-1120 GB29NWBK60161331926819"
    val dir = docsDir(Seq((7L, text)))
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val partial = raw
      .select(TextAnalysis.piiRedact(col("text"), Set("email", "ssn")).as("r"))
      .as[String].head()
    assert(partial == "<EMAIL> 555-0100 10.0.0.1 <SSN> GB29NWBK60161331926819")
    // empty set = no-op scrub
    val none = raw.select(TextAnalysis.piiRedact(col("text"), Set.empty[String]).as("r"))
      .as[String].head()
    assert(none == text)
    // a typo'd class silently not scrubbing would be the worst failure mode
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.piiRedact(col("text"), Set("emial"))
    }
    assert(e.getMessage.contains("unknown PII classes"))
  }

  test("redacted digest of a no-PII doc equals the digest of the augmented text unchanged") {
    val dir = docsDir(Seq((11L, "nothing sensitive here")))
    val r = TextAnalysis.tx_pii(spark, dir).collect().head
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("nothing sensitive here".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("redact_digest") == expected)
  }
}
