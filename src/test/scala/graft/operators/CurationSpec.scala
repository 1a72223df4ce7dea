package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Controlled-input semantics for the curation operators (the DuckDB oracle
  * covers the synthetic corpus; these pin edge behavior and the documented
  * guarantees: determinism, keeper choice, broadcast-side dedup).
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** Write a documents table with the corpus schema to a temp dir. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("curation").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val sixteen = (1 to 16).map(i => s"w$i").mkString(" ")

  test("dd_para: a 16-word chunk shared by two docs is reported once, keeper = min doc_id") {
    val dir = docsDir(Seq(
      (1L, sixteen + " tail one two three", "en", "s"),
      (2L, sixteen, "en", "s"),
      (3L, "entirely different words here", "en", "s")))
    val rows = Curation.dd_para(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_docs") == 2)
    assert(rows(0).getAs[Long]("n_occ") == 2)
    assert(rows(0).getAs[Long]("keeper") == 1L)
  }

  test("dd_lines: first occurrence wins in (doc_id, pos) order; duplicate doc rewrites to empty; within-doc repeats drop") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val dir = docsDir(Seq(
      (1L, sixteen + " unique one two three", "en", "s"), // chunks: [sixteen, "unique one two three"]
      (2L, sixteen, "en", "s"),                           // exact repeat of doc1's chunk 0
      (3L, sixteen + " " + sixteen + " fresh tail words", "en", "s"), // within-doc repeat + seen chunk
      (4L, "entirely different words here", "en", "s")))
    val got = Curation.dd_lines(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 owns every first occurrence: rewrite reproduces the original bit-for-bit
    assert(got(1L) == ((2L, 2L, md5hex(sixteen + " unique one two three"))))
    // doc 2 is entirely previously-seen lines -> empty rewrite
    assert(got(2L) == ((1L, 0L, md5hex(""))))
    // doc 3: chunk 0 (sixteen) seen at doc 1; chunk 1 (sixteen again) is a
    // WITHIN-corpus repeat too; only the fresh tail survives
    assert(got(3L) == ((3L, 1L, md5hex("fresh tail words"))))
    assert(got(4L) == ((1L, 1L, md5hex("entirely different words here"))))
  }

  test("rel_diff: residue-derived snapshot classifies added/removed/changed/unchanged exactly") {
    val dir = docsDir((0L to 9L).map(i => (i, s"document number $i body", "en", "s")))
    val got = Curation.rel_diff(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("removed") == ((1L, 0L, 0L)))
    assert(got("changed") == ((1L, 1L, 1L)))
    assert(got("added") == ((1L, 1000000002L, 1000000002L)))
    assert(got("unchanged") == ((8L, 2L, 9L)))
    assert(got.size == 4)
  }

  test("tx_entropy: run-length histogram matches hand counts; empty doc yields zeros") {
    val dir = docsDir(Seq(
      (1L, "aabbbb", "en", "s"), // a:2 b:4 -> n=6 distinct=2 top=4 coll=4+16
      (2L, "", "en", "s"),
      (3L, "z", "en", "s")))
    val got = TextAnalysis.tx_entropy(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((6L, 2L, 4L, 20L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L)))
    assert(got(3L) == ((1L, 1L, 1L, 1L)))
  }

  test("tx_entropy: a char is a Unicode CODE POINT on both engines — a supplementary-plane char counts as 1") {
    // Spark's split runs on UTF8String and an empty pattern yields code
    // points (NOT Java String's UTF-16 code units), which is exactly
    // DuckDB string_split's unit — so the oracle agreement extends beyond
    // ASCII; this pins it so an engine change fails loudly here instead of
    // silently hash-mismatching on a non-ASCII corpus
    val dir = docsDir(Seq((1L, "a😀b", "en", "s"))) // a + emoji + b
    val r = TextAnalysis.tx_entropy(spark, dir).collect().head
    assert(r.getAs[Long]("n_chars") == 3L)
    assert(r.getAs[Long]("n_distinct_chars") == 3L)
  }

  test("samp_importance: target-distinctive bigrams outscore non-target; invariant under file layout") {
    val enText = "alpha beta alpha beta alpha beta"  // en-only bigrams
    val deText = "gamma delta gamma delta gamma delta" // de-only bigrams
    val rows = Seq(
      (1L, enText, "en", "s"), (2L, enText, "en", "s"),
      (3L, deText, "de", "s"), (4L, enText, "de", "s")) // doc 4: de doc made of en-mass bigrams
    val dir = docsDir(rows)
    val got = Curation.samp_importance(spark, dir, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // en-bigram docs (1, 2, 4) share identical bucket mass -> identical
    // scores, strictly above the de-only doc 3 (its buckets have n_target=0)
    assert(got(1L) == got(2L) && got(2L) == got(4L))
    assert(got(3L) == 0.0 && got(1L) > 0.0)
    // layout invariance: the same rows written as 3 files score identically
    val dir2 = java.nio.file.Files.createTempDirectory("curation").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3).write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val got2 = Curation.samp_importance(spark, dir2, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq.sorted
    val got1 = Curation.samp_importance(spark, dir, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq.sorted
    assert(got1 == got2)
  }

  test("samp_dsir: content (not label) drives lambda; full-row replay against a driver-side reference of the exact integer algebra; misconfigurations refuse") {
    import graft.operators.TextAnalysis.log2Fp
    val enText = "alpha beta alpha beta alpha beta"
    val deText = "gamma delta gamma delta gamma delta"
    val rows = Seq(
      (1L, enText, "en", "s"), (2L, enText, "en", "s"),
      (3L, deText, "de", "s"), (4L, enText, "de", "s")) // de label, en content
    val dir = docsDir(rows)
    val got = Curation.samp_dsir(spark, dir, k = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // driver-side reference replay of the published algebra with log2Fp
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      if (w.size < 2) Seq(w.mkString(" "))
      else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val all = rows.flatMap { case (id, t, lang, _) =>
      bigrams(t).map(g => (id, lang, md5hex(g).take(3)))
    }
    val nRaw = all.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val nTgt = all.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, xs) => b -> xs.size.toLong }.withDefaultValue(0L)
    val (tRaw, tTgt) = (nRaw.values.sum, nTgt.values.sum)
    val bDom = 4096L
    val constFp = log2Fp(tRaw + bDom, 1L) - log2Fp(tTgt + bDom, 1L)
    val refRows = rows.map { case (id, t, _, _) =>
      val cs = bigrams(t).map(g => md5hex(g).take(3)).groupBy(identity)
        .map { case (b, xs) => b -> xs.size.toLong }
      val lambda = cs.map { case (b, c) =>
        c * (log2Fp(nTgt(b) + 1L, 1L) - log2Fp(nRaw(b) + 1L, 1L))
      }.sum + cs.values.sum * constFp
      val h1 = java.lang.Long.parseLong(
        md5hex(s"$id|dsir42").take(5), 16) + 1L
      val a = math.max(1L, (20L << 20) - log2Fp(h1, 1L))
      val g = (20L << 20) - log2Fp(a, 1L)
      id -> ((lambda, g, lambda + g))
    }.toMap
    assert(got == refRows,
      "samp_dsir must replay the reference integer algebra row-for-row")
    // content drives lambda: docs 1, 2, 4 share bigram mass -> equal
    // lambda, strictly above the de-vocabulary doc 3
    assert(got(1L)._1 == got(2L)._1 && got(2L)._1 == got(4L)._1)
    assert(got(3L)._1 < got(1L)._1)
    // deterministic across invocations
    val again = Curation.samp_dsir(spark, dir, k = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again == got)
    // misconfigurations refuse loudly
    assert(intercept[IllegalArgumentException] {
      Curation.samp_dsir(spark, dir, k = 0)
    }.getMessage.contains("k=0"))
    assert(intercept[IllegalArgumentException] {
      Curation.samp_dsir(spark, dir, hexChars = 0)
    }.getMessage.contains("hexChars"))
    // the empty-target refusal is IN-PLAN (raise_error — the totals never
    // visit the driver), so it surfaces at action time, not construction
    assert(intercept[Exception] {
      Curation.samp_dsir(spark, dir, targetLang = "xx").collect()
    }.getMessage.contains("target slice"))
  }

  test("samp_dsir: the Gumbel u=1 clamp and the exact key tie (the adversarial gate's plants, in-suite)") {
    import graft.operators.TextAnalysis.log2Fp
    // deterministic searched ids (tools/check_dsir_adversarial.py):
    // md5('2240003|dsir42') starts fffff (the u=1 lattice point);
    // 66 and 183 share the 5-hex prefix 25021 (the birthday pair).
    // Pin the hash properties here so a digest change fails loudly
    // instead of silently degrading this test to ordinary inputs.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(md5hex("2240003|dsir42").take(5) == "fffff")
    assert(md5hex("66|dsir42").take(5) == md5hex("183|dsir42").take(5))
    val dir = docsDir(Seq(
      (1L, "alpha beta alpha beta gamma", "en", "s"),
      (3L, "delta epsilon delta epsilon", "de", "s"),
      (2240003L, "alpha beta gamma", "en", "s"),
      (66L, "zeta eta theta zeta", "de", "s"),   // identical text: identical
      (183L, "zeta eta theta zeta", "de", "s"))) // lambda AND gumbel -> key tie
    val rows = Curation.samp_dsir(spark, dir, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byId = rows.map(r => r._1 -> r).toMap
    // u=1: a = max(1, 20<<20 - log2Fp(2^20)) clamps to 1, gumbel exactly
    // 20<<20 - log2Fp(1) = 20<<20
    assert(byId(2240003L)._3 == (20L << 20))
    assert(log2Fp(1L << 20, 1L) == (20L << 20)) // the clamp's trigger value
    // the pair ties bit-exactly on lambda, gumbel, and key; emitted order
    // breaks to the smaller doc_id
    assert(byId(66L)._2 == byId(183L)._2 && byId(66L)._3 == byId(183L)._3 &&
      byId(66L)._4 == byId(183L)._4)
    assert(rows.indexOf(byId(66L)) == rows.indexOf(byId(183L)) - 1,
      "equal key_fp must emit the smaller doc_id first")
  }

  test("samp_dsir: hexChars>5 drops the broadcast hint (AQE picks) and still selects") {
    val dir = "/root/testdata/sf0.001"
    // up to 16^6 observed buckets can exceed broadcast limits — the
    // bucket-weight hint must be absent so AQE sizes the join from the
    // real census; only the provably-1-row smoothing-constant hint stays
    def hints(hexChars: Int) = Curation
      .samp_dsir(spark, dir, hexChars = hexChars, k = 5)
      .queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.size
    assert(hints(3) == 2, "small feature space keeps both broadcast hints")
    assert(hints(6) == 1, "hexChars=6 must drop the bucket-weight hint")
    val rows = Curation.samp_dsir(spark, dir, hexChars = 6, k = 5).collect()
    assert(rows.length == 5 && rows.map(_.getLong(0)).distinct.length == 5)
  }

  test("dsir weight artifact: round-trips exactly; corrupt, truncated, and width-mismatched tables refuse") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val path = java.nio.file.Files.createTempDirectory("dsirart").toString + "/w"
    Curation.writeDsirWeights(spark, dir, path)
    val fresh = Curation.dsirGateArtifact(spark, dir)
    val loaded = Curation.readDsirWeights(spark, path)
    assert(loaded == fresh, "persisted weights must round-trip bit-exactly")
    // overwrite is a swap, not a delete-then-write: a second write over
    // the live artifact leaves a loadable table
    Curation.writeDsirWeights(spark, dir, path)
    assert(Curation.readDsirWeights(spark, path) == fresh)
    def writeRaw(rows: Seq[(String, Long)], p: String): String = {
      rows.toDF("bucket", "weight").coalesce(1)
        .write.mode("overwrite").parquet(p)
      p
    }
    val base = java.nio.file.Files.createTempDirectory("dsirbad").toString
    // lost sentinel
    intercept[IllegalArgumentException] {
      Curation.readDsirWeights(spark,
        writeRaw(Seq(("abc", 1L), ("__hexchars__", 3L)), s"$base/nosent"))
    }
    // no weight rows (truncated to sentinels only)
    intercept[IllegalArgumentException] {
      Curation.readDsirWeights(spark,
        writeRaw(Seq(("__const__", 5L), ("__hexchars__", 3L)), s"$base/empty"))
    }
    // bucket width disagrees with the declared hexChars
    intercept[IllegalArgumentException] {
      Curation.readDsirWeights(spark,
        writeRaw(Seq(("abcd", 1L), ("__const__", 5L), ("__hexchars__", 3L)),
          s"$base/width"))
    }
    // out-of-range declared width
    intercept[IllegalArgumentException] {
      Curation.readDsirWeights(spark,
        writeRaw(Seq(("abc", 1L), ("__const__", 5L), ("__hexchars__", 9L)),
          s"$base/hex9"))
    }
    // duplicate bucket rows (a merged/partially-rewritten artifact)
    intercept[IllegalArgumentException] {
      Curation.readDsirWeights(spark,
        writeRaw(Seq(("abc", 1L), ("abc", 2L), ("__const__", 5L),
          ("__hexchars__", 3L)), s"$base/dup"))
    }
  }

  test("dd_para: chunking is stride-aligned — the same words at a different offset do not collide") {
    val dir = docsDir(Seq(
      (1L, sixteen, "en", "s"),
      (2L, "shift " + sixteen, "en", "s"))) // chunk boundaries differ
    assert(Curation.dd_para(spark, dir).count() == 0)
  }

  test("samp_stratified: membership matches an independent md5 computation and is deterministic") {
    val rows = (1L to 40L).map(i => (i, s"document body number $i", if (i % 2 == 0) "en" else "de", "s"))
    val dir = docsDir(rows)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = rows.groupBy(_._3).map { case (lang, rs) =>
      lang -> (rs.size.toLong, rs.count(r => md5hex(r._2).substring(0, 2) < "40").toLong)
    }
    val got = Curation.samp_stratified(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    val again = Curation.samp_stratified(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == got)
  }

  test("decon_ngram: a training doc sharing an 8-gram with the eval slice is flagged; others are not") {
    val eight = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = docsDir(Seq(
      (1L, s"$eight and some eval padding", "en", "src0"),
      (2L, s"prefix words $eight suffix words", "en", "src1"), // contaminated
      (3L, "totally unrelated training document text body", "en", "src1")))
    val got = Curation.decon_ngram(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSet == Set(2L))
    assert(got.head._2 >= 1L)
  }

  test("samp_reservoir: exact per-source quota, ranked by md5 — smallest hashes win deterministically") {
    val rows = (1L to 60L).map(i => (i, s"reservoir doc $i", "en", if (i <= 40) "sA" else "sB"))
    val dir = docsDir(rows)
    val got = Curation.samp_reservoir(spark, dir, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.count(_._1 == "sA") == 5 && got.count(_._1 == "sB") == 5)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expectA = rows.filter(_._4 == "sA").sortBy(r => (md5hex(r._2), r._1)).take(5).map(_._1)
    assert(got.filter(_._1 == "sA").sortBy(_._3).map(_._2).toSeq == expectA)
  }

  test("samp_split: content-addressed — the same text gets the same split regardless of source") {
    val rows = (1L to 30L).map(i => (i, s"split doc body $i", "en", s"src${i % 3}"))
    val dir = docsDir(rows)
    val counts = Curation.samp_split(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts.values.sum == 30L)
    assert(counts.keys.map(_._2).forall(Set("train", "val", "test")))
    // same text in a different source → identical split assignment
    val dir2 = docsDir(rows.map { case (id, text, lang, _) => (id, text, lang, "other") })
    val bySplit2 = Curation.samp_split(spark, dir2).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val bySplit1 = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(bySplit2 == bySplit1)
  }

  test("tx_gopher: each criterion trips independently; keep is their conjunction") {
    val fifty = (1 to 50).map(i => s"the of word$i").mkString(" ") // 150 words, has stopwords
    val dir = docsDir(Seq(
      (1L, fifty, "en", "s"),                           // passes everything
      (2L, "too short to pass the word count", "en", "s"), // fails word count
      (3L, (1 to 60).map(_ => "a b").mkString(" ").trim, "en", "s"))) // mean word len 1 → fails
    val got = TextAnalysis.tx_gopher(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"))
    assert(!got(2L).getAs[Boolean]("ok_word_count") && !got(2L).getAs[Boolean]("keep"))
    assert(got(3L).getAs[Boolean]("ok_word_count") && !got(3L).getAs[Boolean]("ok_mean_word_len"))
  }

  test("embed_quantize: values bounded by int8 range, zero vectors guarded, reconstruction within 1/scale") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("quant").toString
    Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f), 0),
      (2L, Seq(0f, 0f, 0f), 0),
      (3L, Seq(3.5f, 2.0f, -3.5f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = TextAnalysis.embed_quantize(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(2L).getAs[Long]("q_min") == 0L && got(2L).getAs[Long]("q_max") == 0L)
    got.values.foreach { r =>
      assert(r.getAs[Long]("q_max") <= 127L && r.getAs[Long]("q_min") >= -128L)
    }
    // vec 1: scale = 127, q = floor(x*127) = [63, -127, 31]
    assert(got(1L).getAs[Long]("q_sum") == (63L - 127L + 31L))
  }

  test("pipeline_curate: quality gate drops, fluency keeps LM-covered survivors, normalized dedup merges, splits partition the keepers") {
    val base = (Seq("the", "of") ++ (1 to 22).map(i => s"word$i")).mkString(" ")
    // ids 0/5/10 put all three docs in the reference slice (doc_id % 5 = 0)
    // so the fluency LM covers them: the two near-identical quality
    // survivors share 22 double-counted bigrams (score 10⁶ each) plus one
    // hapax last bigram (500000) → sb_mean = 22500000 div 23 = 978260; the
    // short doc scores 10⁶. p25 of [978260, 978260, 10⁶] interpolates to
    // 978260, so both survivors pass the tail cut.
    val dir = docsDir(Seq(
      (0L, base, "en", "s"),
      (5L, base + ".", "en", "s"), // punctuation variant -> same normalized digest
      (10L, "way too short", "en", "s"))) // fails the word-count gate
    val got = Curation.pipeline_curate(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("0_raw") == 3L)
    assert(got("1_quality") == 2L)
    assert(got("2_fluency") == 2L)
    assert(got("3_dedup") == 1L)
    assert(got.filter(_._1.startsWith("4_split_")).values.sum == 1L)
    // an empty reference slice must pass NOTHING through the fluency
    // screen (the twin's empty-pd join), not fail the audit query
    val noRef = docsDir(Seq((1L, base, "en", "s")))
    val g2 = Curation.pipeline_curate(spark, noRef).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2 == Map("0_raw" -> 1L, "1_quality" -> 1L, "2_fluency" -> 0L,
      "3_dedup" -> 0L))
  }

  test("normalize is idempotent on 300 seeded-random strings (unicode, punctuation, space runs)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.normalize
    val rnd = new scala.util.Random(42)
    val pool = "abcXYZ019 ,.!?'\"()-_#@/\\\tü漢éĄ   "
    val strs = (1 to 300).map(_ =>
      (1 to rnd.nextInt(60)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val mismatches = strs.toDF("t")
      .select(normalize(col("t")).as("n1"))
      .select(col("n1"), normalize(col("n1")).as("n2"))
      .filter(col("n1") =!= col("n2"))
      .count()
    assert(mismatches == 0L)
  }

  test("dd_para finds every planted stride-aligned chunk across 50 seeded-random doc pairs") {
    val rnd = new scala.util.Random(7)
    def word() = (1 to 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val rows = (0 until 50).flatMap { i =>
      val chunk = (1 to 16).map(_ => word()).mkString(" ")
      val tailA = (1 to rnd.nextInt(20)).map(_ => word()).mkString(" ")
      val tailB = (1 to rnd.nextInt(20)).map(_ => word()).mkString(" ")
      Seq((2L * i, s"$chunk $tailA".trim, "en", "s"),
        (2L * i + 1, s"$chunk $tailB".trim, "en", "s"))
    }
    val dir = docsDir(rows)
    val found = Curation.dd_para(spark, dir).collect()
    assert(found.length == 50, s"expected all 50 planted chunks, got ${found.length}")
    assert(found.forall(_.getAs[Long]("n_docs") == 2L))
  }

  test("samp_reservoir quota is exactly min(k, stratum size) on a seeded-random corpus") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 120L).map(i =>
      (i, s"random body ${rnd.nextInt(1000000)} of doc $i", "en", s"src${rnd.nextInt(4)}"))
    val dir = docsDir(rows)
    val bySource = rows.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val counts = Curation.samp_reservoir(spark, dir, k = 25).collect()
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    assert(counts == bySource.map { case (s, n) => s -> math.min(25L, n) })
  }

  test("outputs are invariant under shuffle-partition count (the property oracle parity rests on)") {
    val dir = "/root/testdata/sf0.001"
    def snap(): Seq[Seq[String]] = Seq(
      Curation.pipeline_curate(spark, dir),
      Curation.samp_reservoir(spark, dir, k = 7),
      Curation.samp_shuffle(spark, dir),
      TextAnalysis.embed_quantize(spark, dir))
      .map(_.collect().map(_.toString).toSeq)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val at3 =
      try { spark.conf.set("spark.sql.shuffle.partitions", "3"); snap() }
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(snap() == at3)
  }

  test("samp_shuffle: a permutation — every doc once, positions dense per shard") {
    val dir = "/root/testdata/sf0.001"
    val rows = Curation.samp_shuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == 500, "every doc exactly once")
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length.toLong),
        s"shard $shard positions must be dense 0..n-1")
    }
    // content-free key: the assignment depends on doc_id only, so a
    // re-crawl (changed text) cannot move a document in training order
    assert(rows.map(r => (r._1, r._2, r._3)).toSet ==
      Curation.samp_shuffle(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("ev_anomaly flags exactly the >2-sigma events (independent Scala recomputation)") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), math.floor(r.getDouble(2) * 100).toLong))
    val expected = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val n = rows.length.toLong
      val s1 = rows.map(_._3).sum
      val s2 = rows.map(x => x._3 * x._3).sum
      rows.toSeq.filter { r => val dev = n * r._3 - s1; dev * dev > 4L * (n * s2 - s1 * s1) }
        .map(_._1)
    }.toSet
    val got = Relational.ev_anomaly(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("tx_salient ranks a rare repeated term above a ubiquitous one") {
    val dir = docsDir(Seq(
      (1L, "zzz zzz zzz the the end", "en", "s"),
      (2L, "the quick brown fox jumps", "en", "s"),
      (3L, "the slow green turtle rests", "en", "s")))
    val top = TextAnalysis.tx_salient(spark, dir).collect()
      .filter(r => r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(top.length == 1 && top.head.getAs[String]("term") == "zzz")
    // tf/df: zzz = 3/1 = 3.0; the = 2/3 on doc 1
    assert(top.head.getAs[Double]("score") == 3.0)
  }

  test("tx_norm: lowercases, strips punctuation, collapses whitespace") {
    val dir = docsDir(Seq((1L, "  Hello,   WORLD!  it's 42 ", "en", "s")))
    val row = TextAnalysis.tx_norm(spark, dir).collect().head
    // normalized text is "hello world its 42" (len 18)
    assert(row.getAs[Long]("norm_len") == 18L)
  }

  test("tx_norm merges case/punctuation variants that exact dedup keeps apart") {
    val dir = docsDir(Seq(
      (1L, "Spark Shuffles, Windows & Joins!", "en", "s"),
      (2L, "spark shuffles windows  joins", "en", "s")))
    val digests = TextAnalysis.tx_norm(spark, dir).collect().map(_.getAs[String]("norm_digest"))
    assert(digests.distinct.length == 1, "variants must normalize to one digest")
    // the raw texts differ, so exact dedup sees two singleton groups
    assert(Dedup.dd_exact(spark, dir).count() == 2)
  }

  test("decon_ngram: a verbatim copy of an eval doc overlaps on EVERY distinct 8-gram") {
    val twelve = (1 to 12).map(i => s"u$i").mkString(" ") // 12 distinct words -> 5 distinct 8-grams
    val dir = docsDir(Seq(
      (1L, twelve, "en", "src0"),
      (2L, twelve, "en", "src1")))
    val got = Curation.decon_ngram(spark, dir).collect()
    assert(got.length == 1 && got.head.getLong(0) == 2L && got.head.getLong(1) == 5L)
  }

  test("tx_repetition: a doc that is one bigram repeated scores top_bigram_frac near 1") {
    val dir = docsDir(Seq(
      (1L, "spam ham spam ham spam ham spam ham", "en", "s"),
      (2L, "each of the twelve words appearing here is completely distinct overall", "en", "s")))
    val got = TextAnalysis.tx_repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 7 bigrams, "spam ham" occurs 4 times -> 4/7
    assert(math.abs(got(1L).getAs[Double]("top_bigram_frac") - 4.0 / 7.0) < 1e-12)
    assert(got(1L).getAs[Boolean]("repetitive"))
    assert(!got(2L).getAs[Boolean]("repetitive"))
    assert(got(2L).getAs[Double]("dup_word_frac") == 0.0)
  }

  test("samp_mixture: thresholds are exactly the weight ratios; binding source keeps all") {
    // the synthetic corpus has uniform per-source counts, so the keep rate
    // of source s is w_s / max(w) exactly — thresholds are round hex
    val r = Curation.samp_mixture(spark, "/root/testdata/sf0.01").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r("src0")._3 == "g", "binding source gets the above-all-hex sentinel")
    assert(r("src0")._2 == r("src0")._1, "keep-all means ALL — incl. prefix-ffffff docs")
    assert(r("src1")._3 == "800000" && r("src2")._3 == "400000" && r("src3")._3 == "200000")
    // heavier weight never keeps a smaller fraction (wide-margin pair only;
    // per-source counts are 25 at this SF, so adjacent rates can tie by luck)
    def frac(s: String) = r(s)._2.toDouble / r(s)._1
    assert(frac("src0") > frac("src3"))
    // deterministic: a second run returns the identical frame
    val again = Curation.samp_mixture(spark, "/root/testdata/sf0.01").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(again == r)
  }

  test("samp_mixture returns empty on an empty corpus, no errors") {
    val empty = docsDir(Seq.empty)
    assert(Curation.samp_mixture(spark, empty).count() == 0)
  }

  test("profile_drift returns empty on an empty corpus; samp_mixture_train refuses loudly") {
    val empty = docsDir(Seq.empty)
    // both snapshots of an empty corpus census to zero buckets — empty
    // frame, never a divide-by-zero in the share window
    assert(Curation.profile_drift(spark, empty).count() == 0)
    // the trainer's loss signal needs a non-empty LM reference slice —
    // the perplexityScored contract's loud failure, not a silent
    // zero-domain fit
    val e = intercept[IllegalArgumentException] {
      Curation.samp_mixture_train(spark, empty)
    }
    assert(e.getMessage.contains("tx_perplexity") ||
      e.getMessage.contains("samp_mixture_train"),
      s"unexpected refusal: ${e.getMessage}")
  }

  test("samp_upsample: epochs match the exact IEEE ratio; copy counts are consistent") {
    // src0 (weight 8) has 3 docs, src9 (default weight 1) has 13 —
    // src9 is the min-rate source (trains exactly once), src0's epochs are
    // fractional: (8/3)/(1/13), realized as base copies + md5-prefix extras
    val rows = (1L to 3L).map(i => (i, s"zero doc $i words here", "en", "src0")) ++
      (10L to 22L).map(i => (i, s"nine doc $i words here", "en", "src9"))
    val dir = docsDir(rows)
    val r = Curation.samp_upsample(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    // same op order as the operator: w/n, then ratio — exact equality holds
    val e0 = (8.0 / 3.0) / (1.0 / 13.0)
    assert(r("src9").getAs[Double]("epochs") == 1.0)
    assert(r("src9").getAs[Long]("base") == 1L)
    assert(r("src0").getAs[Double]("epochs") == e0)
    assert(r("src0").getAs[Long]("base") == math.floor(e0).toLong)
    r.values.foreach { row =>
      val (n, base, extra, total) = (row.getAs[Long]("n_docs"), row.getAs[Long]("base"),
        row.getAs[Long]("n_extra"), row.getAs[Long]("n_total"))
      assert(total == base * n + extra)
      assert(extra >= 0 && extra <= n)
      assert(base >= 1L, "every source trains at least one full epoch")
    }
  }

  test("decon_spans: adjacent eval-matched grams merge, separated ones split, short docs escape") {
    def ws(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    val E = ws("e", 1, 8); val F = ws("f", 1, 8)
    val dir = docsDir(Seq(
      // eval slice (id % 3 == 0): E and F blocks separated by two words,
      // plus a second unrelated eval doc
      (0L, s"$E mid1 mid2 $F", "en", "s"),
      (3L, ws("u", 1, 9), "en", "s"),
      // train: E embedded mid-doc → one span [2,9] of 12 words
      (1L, s"x1 x2 $E y1 y2", "en", "s"),
      // train: E then F back-to-back — doc grams at pos 0 and 8 match,
      // intervals [0,7] and [8,15] are ADJACENT → one merged island
      (2L, s"$E $F", "en", "s"),
      // train: no overlap at all → absent from the audit
      (4L, ws("v", 1, 10), "en", "s"),
      // train: shares words but is under k=8 words → the length floor
      (5L, "e1 e2 e3", "en", "s"),
      // train: E, a 2-word gap, F — gap breaks the island → two spans
      (7L, s"$E z1 z2 $F", "en", "s")))
    val rows = Curation.decon_spans(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 7L))
    def tup(id: Long) = {
      val r = rows(id)
      (r.getAs[Long]("n_words"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("overlap_words"), r.getAs[Long]("max_span"),
        r.getAs[Double]("overlap_frac"))
    }
    assert(tup(1L) == ((12L, 1L, 8L, 8L, 8.0 / 12)))
    assert(tup(2L) == ((16L, 1L, 16L, 16L, 1.0)))
    assert(tup(7L) == ((18L, 2L, 16L, 8L, 16.0 / 18)))
  }

  test("samp_split_leakfree: a near-dup pair that hashes across splits is reunited in the anchor's split") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOfRef(t: String): String = {
      val p3 = md5hex(t).take(3)
      if (p3 < "e66") "train" else if (p3 < "f33") "val" else "test"
    }
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    // deterministic search for a near-dup suffix whose content address
    // lands in a DIFFERENT split than the base — the leak case
    val leaky = (1 to 200).map(i => s"$base extra$i")
      .find(v => splitOfRef(v) != splitOfRef(base))
    assert(leaky.nonEmpty, "no split-crossing variant in 200 candidates")
    val other = (1 to 20).map(i => s"q$i").mkString(" ") // unclustered
    val dir = docsDir(Seq(
      (10L, base, "en", "s"),
      (11L, leaky.get, "en", "s"),
      (12L, other, "en", "s")))
    val rows = Curation.samp_split_leakfree(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val anchorSplit = splitOfRef(base)
    // both cluster members in the anchor's split; exactly one was moved
    assert(rows.collect { case (s, n, _) if s == anchorSplit => n }.sum >= 2)
    assert(rows.map(_._3).sum == 1L, s"exactly one doc re-assigned: $rows")
    // the unclustered doc keeps its own content address
    val otherSplit = splitOfRef(other)
    assert(rows.exists { case (s, n, _) => s == otherSplit && n >= 1 })
  }

  test("samp_split_leakfree_graph: every citation island lands in its anchor's split; census equals the walked-cycle reference") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOfRef(t: String): String = {
      val p3 = md5hex(t).take(3)
      if (p3 < "e66") "train" else if (p3 < "f33") "val" else "test"
    }
    // independent reference: the link components are the permutation
    // cycles of x -> (31x+7) mod n (the planted edge family)
    val n = 20
    def comps: Map[Long, Long] = {
      val seen = scala.collection.mutable.Set.empty[Long]
      val out = scala.collection.mutable.Map.empty[Long, Long]
      for (s0 <- 0L until n) if (!seen(s0)) {
        val mem = scala.collection.mutable.ArrayBuffer.empty[Long]
        var x = s0
        while (!seen(x)) { seen += x; mem += x; x = (31 * x + 7) % n }
        mem.foreach(m => out(m) = mem.min)
      }
      out.toMap
    }
    val comp = comps
    // texts: a non-anchor member of doc 0's island gets a SEARCHED text
    // whose content address crosses splits vs the anchor's — the leak
    // case must provably engage (moved > 0 by construction)
    val anchor0 = comp(0L)
    val member = (0L until n).find(i => comp(i) == anchor0 && i != anchor0).get
    def baseText(i: Long) = (1 to 15).map(j => s"g${i}w$j").mkString(" ")
    val aSplit = splitOfRef(baseText(anchor0))
    val leaky = (1 to 300).map(k => s"${baseText(member)} extra$k")
      .find(v => splitOfRef(v) != aSplit)
    assert(leaky.nonEmpty, "no split-crossing variant in 300 candidates")
    val texts = (0L until n).map(i =>
      i -> (if (i == member) leaky.get else baseText(i))).toMap
    val dir = docsDir((0L until n).map(i => (i, texts(i), "en", "s")))
    val got = Curation.samp_split_leakfree_graph(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // reference census: every doc splits by its island anchor's text
    val want = (0L until n).map { i =>
      val sp = splitOfRef(texts(comp(i)))
      (sp, sp != splitOfRef(texts(i)))
    }.groupBy(_._1).map { case (sp, xs) =>
      ("s", sp, xs.size.toLong, xs.count(_._2).toLong)
    }.toSeq.sortBy(_._2)
    assert(got == want, s"census diverges from the walked-cycle reference")
    assert(got.map(_._4).sum >= 1L, "the planted leak case must move a doc")
  }

  test("samp_curriculum: quartile phases roughly balanced, positions dense per (phase, shard), deterministic") {
    val dir = "/root/testdata/sf0.001"
    val a = Curation.samp_curriculum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = Curation.samp_curriculum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq, "the order is the reproducibility contract")
    assert(a.length == 500 && a.map(_._1).distinct.length == 500)
    // exact quartile cuts → each phase within ±10% of n/4 (ties at the
    // cut points move a handful of docs between adjacent phases)
    val byPhase = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byPhase.keySet == Set(0L, 1L, 2L, 3L))
    byPhase.values.foreach(n => assert(math.abs(n - 125) <= 13, byPhase))
    // positions dense and zero-based within every (phase, shard)
    a.groupBy(t => (t._2, t._3)).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == (0L until g.length))
    }
  }

  test("decon_spans_trim: contaminated spans cut, clean docs byte-exact, fully-contaminated doc trims to empty") {
    def ws(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    val E = ws("e", 1, 8); val F = ws("f", 1, 8)
    val dir = docsDir(Seq(
      (0L, s"$E mid1 mid2 $F", "en", "s"), // eval
      (1L, s"x1 x2 $E y1 y2", "en", "s"), // span [2,9] cut
      (2L, s"$E $F", "en", "s"), // fully contaminated
      (4L, ws("v", 1, 10), "en", "s"), // untouched, >= k words
      (5L, "e1 e2 e3", "en", "s"), // under k words — untouched
      (7L, s"$E z1 z2 $F", "en", "s"))) // two spans cut, gap survives
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Curation.decon_spans_trim(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // training slice only — the eval doc is not emitted
    assert(rows.keySet == Set(1L, 2L, 4L, 5L, 7L))
    assert(rows(1L) == ((12L, 4L, md5hex("x1 x2 y1 y2"))))
    assert(rows(2L) == ((16L, 0L, md5hex(""))))
    assert(rows(4L) == ((10L, 10L, md5hex(ws("v", 1, 10)))))
    assert(rows(5L) == ((3L, 3L, md5hex("e1 e2 e3"))))
    assert(rows(7L) == ((18L, 2L, md5hex("z1 z2"))))
  }

  test("samp_mixture_train: fitted weights beat uniform AND the fixed map on the DRO objective; trajectory invariants hold") {
    val dir = "/root/testdata/sf0.001"
    val t = Curation.samp_mixture_train(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    val iters = t.map(_._1).max
    val flu = t.filter(_._1 == 0L).map(r => r._2 -> r._3).toMap
    def wAt(round: Long) = t.filter(_._1 == round).map(r => r._2 -> r._4).toMap
    val w0 = wAt(0L); val wT = wAt(iters)
    // weights are a distribution in millionths every round: positive, and
    // summing to ~10^6 (integer flooring loses < nd per normalize)
    (0L to iters).foreach { r =>
      val w = wAt(r)
      assert(w.values.forall(_ >= 1L), s"round $r: non-positive weight")
      val s = w.values.sum
      assert(s > 990000L && s <= 1001000L, s"round $r: weight sum $s")
    }
    // DRO objective: the mixture-weighted mean fluency. Lower = the mix
    // shifted toward hard (low-fluency) domains = higher worst-case
    // coverage — the DoReMi direction.
    def j(w: Map[String, Double]): Double =
      w.map { case (s, wv) => wv * flu(s).toDouble }.sum / w.values.sum
    val jFitted = j(wT.view.mapValues(_.toDouble).toMap)
    val jUniform = j(w0.view.mapValues(_.toDouble).toMap)
    assert(jFitted < jUniform,
      s"fitted mixture ($jFitted) must target harder data than uniform ($jUniform)")
    // the fixed hand-set map, normalized over the same domains (unknown
    // sources get the default weight, as the sampler applies it)
    val fixed = flu.keys.map(s => s ->
      Curation.mixtureWeights.getOrElse(s, Curation.mixtureDefaultWeight)).toMap
    val jFixed = j(fixed)
    assert(jFitted < jFixed,
      s"fitted mixture ($jFitted) must beat the fixed map ($jFixed) on the DRO objective")
    // the hardest domain gains weight; the easiest loses it
    val hardest = flu.minBy(_._2)._1
    val easiest = flu.maxBy(_._2)._1
    assert(wT(hardest) > w0(hardest), "hardest domain must gain weight")
    assert(wT(easiest) < w0(easiest), "easiest domain must lose weight")
  }

  test("samp_mixture_train: the multiplicative-factor clamp engages on an extreme fluency spread and the trajectory stays exact") {
    // the shipped corpus's fluencies are near-uniform, so the trainer's
    // max(1, .) clamps never fire under the hash gate — this plant drives
    // the most fluent domain's factor NEGATIVE (10^6 + excess*eta < 1)
    // and replays every round from the Spark round-0 loss table with an
    // independent spelling of the integer algebra (the
    // check_mixture_adversarial.py device, on the Scala side)
    val rich = "the cat sat on the mat and the dog ran to the cat"
    val rows = (0 until 20).map(i => (i.toLong, rich, "en", "rich")) ++
      Seq("junk1", "junk2").flatMap { s =>
        (0 until 20).map { j =>
          val id = 20L + (if (s == "junk1") 0 else 20) + j
          val txt = (0 until 12).map(k => s"${s}tok${id}x$k").mkString(" ")
          (id, txt, "en", s)
        }
      }
    val dir = docsDir(rows)
    val t = Curation.samp_mixture_train(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val iters = t.map(_._1).max.toInt
    val flu = t.filter(_._1 == 0L).map(r => r._2 -> r._3).toMap
    val srcs = flu.keys.toSeq.sorted
    val u = 1000000L / srcs.size
    var w = srcs.map(_ -> u).toMap
    var clampedAny = false
    (1 to iters).foreach { r =>
      val wsum = w.values.sum
      val wavg = srcs.map(s => flu(s) * w(s)).sum / wsum
      val exc = srcs.map(s => s -> (wavg - flu(s))).toMap
      srcs.foreach { s =>
        if (1000000L + exc(s) * 50L < 1L) clampedAny = true
      }
      val raw = srcs.map(s => s ->
        math.max(1L, w(s) * math.max(1L, 1000000L + exc(s) * 50L) / 1000000L)).toMap
      val rsum = raw.values.sum
      w = srcs.map(s => s -> math.max(1L,
        ((1000000L - 10000L) * (raw(s) * 1000000L / rsum) + 10000L * u) / 1000000L)).toMap
      val got = t.filter(_._1 == r.toLong).map(q => q._2 -> ((q._4, q._5))).toMap
      val want = srcs.map(s => s -> ((exc(s), w(s)))).toMap
      assert(got == want, s"round $r: Spark trajectory must equal the replay")
    }
    assert(clampedAny,
      "the plant must engage the factor clamp, or this spec tests nothing new")
  }

  test("samp_mixture_train_excess: clipped reference excess drives weights and disagrees with the self-referential form") {
    val dir = "/root/testdata/sf0.001"
    val t = Curation.samp_mixture_train_excess(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val iters = t.map(_._1).max
    // λ invariants: excess = max(0, ref_flu − flu), frozen across rounds
    // (the reference model is frozen in DoReMi; the proxy here is a
    // per-snapshot scoring artifact)
    t.foreach { case (_, src, flu, ref, lam, _) =>
      assert(lam == math.max(0L, ref - flu), s"$src: λ must be clipped excess")
      assert(ref == Curation.mixtureRefFlu(src), s"$src: planted reference")
    }
    val last = t.filter(_._1 == iters).sortBy(r => (r._5, r._2))
    // zero-excess domains (already at/above reference) collapse to one
    // shared minimum weight — the clip at work; weights are monotone in λ
    val zeroW = last.filter(_._5 == 0L).map(_._6).toSet
    assert(zeroW.size == 1 && zeroW.head == last.map(_._6).min,
      s"clipped domains must share the minimum weight, got $zeroW")
    last.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a._6 <= b._6, s"weight must be monotone in λ: $a vs $b")
    }
    // THE SEPARATION: the self-referential form upweights the minimum-flu
    // domain; the published form upweights the domain with the largest
    // clipped excess vs its reference — on this corpus those are
    // different domains, so the two argmax weights disagree
    val excessTop = last.maxBy(_._6)._2
    assert(excessTop == last.maxBy(_._5)._2,
      "excess form's top weight must sit on the max-λ domain")
    val raw = Curation.samp_mixture_train(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    val rawIters = raw.map(_._1).max
    val rawTop = raw.filter(_._1 == rawIters).maxBy(_._4)._2
    val minFlu = raw.filter(_._1 == 0L).minBy(_._3)._2
    assert(rawTop == minFlu, "raw form's top weight sits on the hardest (min-flu) domain")
    assert(excessTop != rawTop,
      s"the two forms must disagree here: excess→$excessTop raw→$rawTop")
    // plug-compat + determinism of the folded weight map
    val w1 = Curation.trainedMixtureWeightsExcess(spark, dir)
    assert(w1.keySet == last.map(_._2).toSet && w1.values.forall(_ >= 1.0))
    assert(Curation.trainedMixtureWeightsExcess(spark, dir) == w1)
  }

  test("samp_mixture_train: trained weights are plug-compatible with the fixed-weight sampler path") {
    val dir = "/root/testdata/sf0.001"
    val trained = Curation.trainedMixtureWeights(spark, dir)
    val d = graft.sources.Tables.loadParallel(spark, dir, "documents")
    // the SAME mixtureThresholds device consumes the fitted map unchanged
    val thr = Curation.mixtureThresholds(d, trained).collect()
    assert(thr.nonEmpty && thr.forall(_.getString(1) != null))
    assert(thr.map(_.getString(0)).toSet == trained.keySet)
    // the binding source (thr = all-16s sentinel-free full keep, i.e. the
    // max rate 1.0 -> 'ffffff'-class threshold) is the one maximizing
    // weight/n — with equal domain sizes, the max-weight = hardest domain
    val counts = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = trained.maxBy { case (s, w) => w / counts(s).toDouble }._1
    val bindingThr = thr.find(_.getString(0) == binding).get.getString(1)
    assert(thr.forall(_.getString(1) <= bindingThr),
      "binding source must carry the max keep threshold")
    // determinism: a second fit returns the identical map (memoized loss
    // frame or not)
    assert(Curation.trainedMixtureWeights(spark, dir) == trained)
  }
}
