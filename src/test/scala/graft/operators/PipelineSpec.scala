package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions._

/** Semantics checks for the data-pipeline operators on controlled inputs
  * (the DuckDB oracle covers the testdata corpus; these pin edge behavior).
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("shingles: sliding word 3-grams; short docs yield the whole doc") {
    val out = Seq("a b c d", "a b").toDF("text")
      .select(shingles(col("text"), 3).as("sh")).collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
  }

  test("cosine: parallel → 1, orthogonal → 0, anti-parallel → -1") {
    val df = Seq(
      (Seq(1f, 0f, 2f), Seq(2f, 0f, 4f)),
      (Seq(1f, 0f, 0f), Seq(0f, 3f, 0f)),
      (Seq(1f, 1f, 0f), Seq(-1f, -1f, 0f)))
      .toDF("a", "b")
      .select(cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("simhash64: identical texts collide, near-identical are close, disjoint are far") {
    val df = Seq(
      (1L, "spark window join filter table scan hash merge sort"),
      (2L, "spark window join filter table scan hash merge sort"),
      (3L, "spark window join filter table scan hash merge group"),
      (4L, "zebra quark lattice osmosis vortex plasma quill ember"))
      .toDF("id", "text")
      .select(col("id"), simhash64(col("text")).as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)))
  }

  test("minhash: identical docs → identical signatures; est_jaccard 1.0 via bands") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words in this document entirely unrelated stuff"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents")
    val sigs = docs
      .select(col("doc_id"), hashedShingles(col("text"), 3).as("hs"))
      .select(col("doc_id"), minhash(col("hs"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("dd_exact + dd_fingerprint on a corpus with known dups") {
    val dir = tmpDocs(Seq(
      (1L, "alpha beta gamma", "en", "s", 16L),
      (2L, "alpha beta gamma", "en", "s", 16L), // exact dup of 1
      (3L, "gamma beta alpha", "en", "s", 16L), // bag-of-words dup of 1
      (4L, "delta epsilon zeta", "en", "s", 18L)))
    val exact = Dedup.dd_exact(spark, dir)
      .orderBy("keeper").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(exact.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L)))
    val fp = Dedup.dd_fingerprint(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(fp.toSeq == Seq((1L, 3L))) // 1, 2, 3 share the word set
  }

  test("dd_minhash and dd_simhash find planted near-dups, skip unrelated") {
    val base = "spark catalyst optimizer rewrites logical plans into physical plans with codegen"
    val near = "spark catalyst optimizer rewrites logical plans into physical plans with whole codegen"
    val dir = tmpDocs(Seq(
      (1L, base, "en", "s", 1L),
      (2L, near, "en", "s", 1L),
      (3L, "totally unrelated text about zebras and quarks and lattices and embers", "en", "s", 1L)))
    val mh = Dedup.dd_minhash(spark, dir, threshold = 0.3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mh.toSeq == Seq((1L, 2L)))
    val sh = Dedup.dd_simhash(spark, dir, maxHamming = 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sh.toSeq == Seq((1L, 2L)))
  }

  test("dd_spans: merges overlapping duplicated 8-grams into maximal spans") {
    // doc 1 and doc 2 share the 10-word region s1..s10 (3 overlapping
    // duplicated 8-grams → ONE merged span of 10 words in each); doc 3 is
    // long but unique (no row); doc 4 is under 8 words (no k-grams, no
    // row); doc 5 repeats an 8-word block internally with a 1-word gap
    // (two disjoint spans — within-doc repetition counts as duplication).
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val block = (1 to 8).map(i => s"r$i").mkString(" ")
    val dir = tmpDocs(Seq(
      (1L, s"u1 u2 u3 u4 u5 $shared u6 u7 u8 u9 u10", "en", "s", 1L),
      (2L, s"v1 v2 $shared v3 v4 v5 v6 v7 v8", "en", "s", 1L),
      (3L, (1 to 12).map(i => s"x$i").mkString(" "), "en", "s", 1L),
      (4L, "w1 w2 w3 w4 w5", "en", "s", 1L),
      (5L, s"$block m1 $block", "en", "s", 1L)))
    val out = Dedup.dd_spans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 5L))
    assert(out(1L) == ((20L, 1L, 10L, 10L))) // n_words, n_spans, dup_words, max_span
    assert(out(2L) == ((18L, 1L, 10L, 10L)))
    assert(out(5L) == ((17L, 2L, 16L, 8L)))
    val frac1 = Dedup.dd_spans(spark, dir)
      .filter(col("doc_id") === 1L).select("dup_frac").head().getDouble(0)
    assert(frac1 == 0.5)
  }

  test("dd_spans_trim: cuts exactly the merged spans, passes short/unique docs") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val block = (1 to 8).map(i => s"r$i").mkString(" ")
    val dir = tmpDocs(Seq(
      (1L, s"u1 u2 $shared u3 u4", "en", "s", 1L),   // 14 words, span covers 10
      (2L, s"v1 $shared v2 v3 v4", "en", "s", 1L),   // 15 words, span covers 10
      (3L, "w1 w2 w3", "en", "s", 1L),               // short: verbatim
      (4L, block, "en", "s", 1L),                    // fully duplicated → empty
      (5L, block, "en", "s", 1L)))                   // fully duplicated → empty
    def md5s(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = Dedup.dd_spans_trim(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((14L, 4L, md5s("u1 u2 u3 u4"))))
    assert(out(2L) == ((14L, 4L, md5s("v1 v2 v3 v4"))))
    assert(out(3L) == ((3L, 3L, md5s("w1 w2 w3"))))
    assert(out(4L) == ((8L, 0L, md5s(""))))
    assert(out(5L) == ((8L, 0L, md5s(""))))
  }

  test("dd_incremental: exact beats near, best-Jaccard partner, store parity") {
    // split mod 5: incoming = residue 4 (docs 4, 9, 14, 19); base = rest
    val t2 = "spark catalyst optimizer rewrites logical plans into physical plans"
    val dir = tmpDocs(Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "s", 1L),
      (2L, t2, "en", "s", 1L),
      (3L, "completely different base content here", "en", "s", 1L),
      (6L, "alpha beta gamma delta epsilon", "en", "s", 1L), // same digest as 1
      (4L, "alpha beta gamma delta epsilon", "en", "s", 1L), // exact dup → min base id 1
      (9L, s"$t2 with codegen", "en", "s", 1L),              // near dup of 2
      (14L, "zebra quark lattice osmosis vortex plasma", "en", "s", 1L), // unique
      (19L, t2, "en", "s", 1L)))                             // exact dup of 2
    val out = Dedup.dd_incremental(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out(4L) == (("exact_dup", 1L)))
    assert(out(9L) == (("near_dup", 2L)))
    assert(out(14L) == (("unique", -1L)))
    assert(out(19L) == (("exact_dup", 2L)))
    // exact dups carry jaccard 1.0; uniques carry null
    val j = Dedup.dd_incremental(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(j(4L).contains(1.0) && j(19L).contains(1.0) && j(14L).isEmpty)
    assert(j(9L).exists(v => v > 0.4 && v < 1.0))
    // the persisted-signature path is bit-identical to the inline path,
    // with the broadcast-Bloom digest screen on (default; sidecar written
    // by writeCorpusSignatures) and off — no false negatives + join-confirm
    // means the screen can never change the output
    val store = java.nio.file.Files.createTempDirectory("graftsig").toString
    Dedup.writeCorpusSignatures(spark, dir, store)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(store, "digest.bloom")))
    val inline = Dedup.dd_incremental(spark, dir).collect().toSeq
    val stored = Dedup.dd_incremental_stored(spark, dir, store).collect().toSeq
    // the screen's observe() fires on the eager exact-path barrier inside
    // the call above: 4 delta probes; the 2 planted exact dups MUST pass
    // (no false negatives); the near-dup and the unique are definite
    // negatives barring a (1 %-fpp) false positive
    val Some((total, passed)) = Dedup.lastBloomScreenStats
    assert(total == 4L && passed >= 2L && passed <= 4L)
    val noBloom =
      Dedup.dd_incremental_stored(spark, dir, store, useBloom = false).collect().toSeq
    assert(inline == stored)
    assert(inline == noBloom)
  }

  test("tx_fingerprint: identical docs collide; near-identical overlap heavily") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val dir = tmpDocs(Seq(
      (1L, base, "en", "s", 1L),
      (2L, base, "en", "s", 1L),
      (3L, base + " nu xi", "en", "s", 1L),
      (4L, "totally different words entirely here now", "en", "s", 1L)))
    val fps = TextAnalysis.tx_fingerprint(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L)._2 != fps(4L)._2)
    assert(fps(3L)._1 >= fps(1L)._1) // superset doc keeps at least as many fps
  }

  test("tx_bpe: reproduces the classic merge sequence; deterministic; ties break lexicographically") {
    // the Sennrich et al. example shape: low x5, lower x2, newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val dir = tmpDocs(Seq((1L, text, "en", "s", text.length.toLong)))
    val got = TextAnalysis.tx_bpe(spark, dir, merges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand-derived: es(9) wins its 3-way tie on left asc; est+</w> follows;
    // then the 7-count tie (l,o) vs (o,w) breaks to (l,o)
    assert(got.toSeq == Seq(
      (0L, "e", "s", 9L),
      (1L, "es", "t", 9L),
      (2L, "est", "</w>", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L)))
    val again = TextAnalysis.tx_bpe(spark, dir, merges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == again.toSeq)
    // a corpus that runs dry stops early instead of looping
    val tiny = tmpDocs(Seq((1L, "ab", "en", "s", 2L)))
    assert(TextAnalysis.tx_bpe(spark, tiny, merges = 10).count() <= 3)
    // encode under the same 5 rules: low→[low,</w>]=2, lower→4,
    // newest→[n,e,w,est</w>]=4, widest→4 ⇒ 5·2+2·4+6·4+3·4 = 54
    val enc = TextAnalysis.tx_bpe_encode(spark, dir, merges = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq == Seq((1L, 16L, 54L)))
  }

  test("mergeFold: exhaustive agreement with the reference leftmost-greedy merge on short {a,b} words") {
    def reference(syms: Seq[String], l: String, r: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    val words = for {
      n <- 0 to 5
      bits <- 0 until (1 << n)
    } yield (0 until n).map(i => if ((bits >> i & 1) == 1) "b" else "a")
    val rules = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "b"),
      ("ab", "a"), ("a", "ab"), ("aa", "aa"))
    for ((l, r) <- rules) {
      val df = words.map(w => Tuple1(w)).toDF("syms")
      val got = df.select(TextAnalysis.mergeFold(col("syms"), l, r)).collect()
        .map(_.getSeq[String](0).toSeq)
      val want = words.map(w => reference(w, l, r))
      assert(got.toSeq == want.toSeq, s"rule ($l,$r)")
    }
    // chained rules manufacture multi-char symbols, hitting the fuse-vs-
    // overlap cases single char-level rules can't reach (e.g. "aa"+"a"
    // must not re-fuse with the "a" it just absorbed)
    val chain = Seq(("a", "a"), ("aa", "a"), ("aa", "aa"), ("b", "aaa"))
    val chained = chain.foldLeft(col("syms"))((c, lr) =>
      TextAnalysis.mergeFold(c, lr._1, lr._2))
    val gotC = words.map(w => Tuple1(w)).toDF("syms").select(chained).collect()
      .map(_.getSeq[String](0).toSeq)
    val wantC = words.map(w => chain.foldLeft(w: Seq[String])((s, lr) =>
      reference(s, lr._1, lr._2)))
    assert(gotC.toSeq == wantC.toSeq)
  }

  test("tx_compress: repetition compresses far below prose; sizes exact; empty doc is ratio 1") {
    val rep = "spam ham " * 200                       // highly repetitive
    val prose = (1 to 200).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")
    val dir = tmpDocs(Seq(
      (1L, rep, "en", "s", rep.length.toLong),
      (2L, prose, "en", "s", prose.length.toLong),
      (3L, "", "en", "s", 0L)))
    val out = TextAnalysis.tx_compress(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 == rep.getBytes("UTF-8").length.toLong)
    assert(out(1L)._3 < 0.1, s"repetition should compress hard: ${out(1L)}")
    assert(out(2L)._3 > out(1L)._3 * 3, s"prose must sit well above repetition: $out")
    assert(out(3L) == ((0L, out(3L)._2, 1.0)))
    // deterministic across runs (same zlib, same level)
    val again = TextAnalysis.tx_compress(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == again)
  }

  test("clusterPairs: connected components with canonical min label") {
    val pairs = Seq((2L, 1L), (2L, 3L), (7L, 8L), (3L, 4L)).toDF("a", "b")
    val got = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("ann_bruteforce: self excluded, ranks dense 1..k, scores non-increasing") {
    val rows = Similarity.ann_bruteforce(spark, "/root/testdata/sf0.001", nQueries = 3, k = 5)
      .collect()
    assert(rows.length == 15)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to 5L))
      assert(byRank.forall(_.getLong(2) != q))
      val scores = byRank.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("ann_radius: equals the top-k twin filtered at the radius; map-only plan (no hash exchange, no window)") {
    val dir = "/root/testdata/sf0.001"
    val thr = Similarity.annRadiusThreshold
    val radius = Similarity.ann_radius(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the twin at exhaustive k, filtered at the radius — same expressions,
    // so equality is exact
    val viaTopK = Similarity.ann_bruteforce(spark, dir, k = 1000000).collect()
      .filter(_.getDouble(3) >= thr)
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(radius.toSet == viaTopK.toSet)
    assert(radius.nonEmpty, "vacuous: nothing clears the radius on this corpus")
    // dense neighborhoods are the point: some query must have MORE radius
    // hits than the default top-k would have returned
    assert(radius.groupBy(_._1).values.map(_.size).max > 10)
    // presentation order within each query: cos desc
    radius.groupBy(_._1).values.foreach { rs =>
      val cs = rs.map(_._3).toSeq
      assert(cs == cs.sorted.reverse)
    }
    // scale pin: scoring is map-side — the only exchange is the final
    // presentation sort's range partitioning
    val p = Similarity.ann_radius(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), s"radius scan must not shuffle:\n$p")
    assert(!p.contains("Window"), "radius must not rank")
    intercept[IllegalArgumentException] {
      Similarity.ann_radius(spark, dir, threshold = 0.0)
    }
  }

  test("ann_lsh candidates are a subset of bruteforce ordering within bucket") {
    val rows = Similarity.ann_lsh(spark, "/root/testdata/sf0.001", nQueries = 3, k = 5, planes = 2)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("tx_langid predicts only known profiles; eval rolls up per language") {
    val pred = TextAnalysis.tx_langid(spark, "/root/testdata/sf0.001")
    val langs = pred.select("predicted").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "de", "fr", "zh")))
    val eval = TextAnalysis.tx_langid_eval(spark, "/root/testdata/sf0.001").collect()
    assert(eval.map(_.getLong(1)).sum == 500)
  }

  test("tx_langid2: trained char-trigram scorer learns languages the stopword profiles cannot see") {
    // the shared five-language plant (graft.TestPlants — also consumed by
    // the langidGate batch-parity spec, ONE corpus definition AND one
    // shared dir, so the trainer memo is hit across suites): every doc
    // avoids every profile stopword, so the stopword scorer degenerates
    // to the zero-hit tie-break (predicts 'zh' for all — accuracy = the
    // zh share, 0.2) while the trained scorer must separate the languages
    // from character trigrams alone.
    val dir = graft.TestPlants.langidDir(spark)
    def accOf(eval: org.apache.spark.sql.DataFrame): Double = {
      val r = eval.agg(sum("n_correct"), sum("n")).first()
      r.getLong(0).toDouble / r.getLong(1)
    }
    val trainedAcc = accOf(TextAnalysis.tx_langid2_eval(spark, dir))
    val stopwordAcc = accOf(TextAnalysis.tx_langid_eval(spark, dir))
    assert(stopwordAcc <= 0.25,
      s"plant must blind the stopword scorer, got $stopwordAcc")
    assert(trainedAcc == 1.0,
      s"trained scorer must separate the planted languages, got $trainedAcc")
    // determinism + memo: a repeat call must produce the identical frame
    // (trainLangidWeights is cached per (dir, iters), and training itself
    // is integer-exact)
    val p1 = TextAnalysis.tx_langid2(spark, dir).collect().map(_.toSeq).toSeq
    val p2 = TextAnalysis.tx_langid2(spark, dir).collect().map(_.toSeq).toSeq
    assert(p1 == p2)
    // the shipped corpus's lang labels are mostly text-independent, so no
    // content scorer can do well — but the trained scorer must still be at
    // least as accurate as the stopword fallback (it learns the majority
    // bias the fallback lacks)
    val t = accOf(TextAnalysis.tx_langid2_eval(spark, "/root/testdata/sf0.001"))
    val b = accOf(TextAnalysis.tx_langid_eval(spark, "/root/testdata/sf0.001"))
    assert(t >= b, s"trained $t must be >= stopword baseline $b on the corpus")
  }

  test("graph_pagerank: a dangling node keeps rank but contributes no mass (n=7 plant, reference-pinned)") {
    // edges are a function of (doc_id, n): at n=7 node 0's three targets
    // are all 0, so the self-loop drop leaves it DANGLING — no out-edges,
    // outdeg 0 through the final left join's coalesce, and its mass
    // simply vanishes (this simplified PageRank does not redistribute,
    // pinned as part of the definition). No shipped corpus size produces
    // a dangling node, so the branch was uncertified. Expected rows from
    // the check_pagerank_adversarial.py reference (twin matches them too).
    val dir = tmpDocs((0L until 7L).map(i => (i, s"doc $i", "en", "s", 6L)))
    val got = Graph.graph_pagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq(
      (1L, 1194702L, 2L), (3L, 1076765L, 2L), (2L, 910217L, 2L),
      (0L, 755625L, 0L), (6L, 602093L, 2L), (4L, 471140L, 2L),
      (5L, 317608L, 2L))
    assert(got == want, s"dangling-node trajectory must match the reference, got $got")
  }

  test("embed_kmeans: an empty cluster carries its previous centroid (twin-seed plant, reference-pinned)") {
    // seeds are the k lowest vec_ids; vec 7 == vec 3 exactly, so every
    // assignment tie breaks to cluster 3 and cluster 7's cell is EMPTY in
    // every round — the carry-previous-centroid branch no shipped SF ever
    // exercises (smallest cell there holds 40+ vectors). Expected rows
    // come from an independent replay of the algebra (the
    // check_kmeans_adversarial.py reference, which the DuckDB twin also
    // matches on this plant); all values float-exact, so the Spark float
    // path and the double reference agree bitwise.
    val dir = tmpEmb(Seq(
      (0L, Seq(0.0f, 0.0f, 0.0f, 0.0f), "x"),
      (1L, Seq(1.0f, 1.0f, 2.0f, 0.5f), "x"),
      (2L, Seq(2.0f, 2.0f, 4.0f, 1.0f), "x"),
      (3L, Seq(3.0f, 0.0f, 1.0f, 1.5f), "x"),
      (4L, Seq(4.0f, 1.0f, 3.0f, 2.0f), "x"),
      (5L, Seq(5.0f, 2.0f, 0.0f, 2.5f), "x"),
      (6L, Seq(6.0f, 0.0f, 2.0f, 3.0f), "x"),
      (7L, Seq(3.0f, 0.0f, 1.0f, 1.5f), "x"),
      (8L, Seq(8.0f, 2.0f, 1.0f, 4.0f), "x"),
      (9L, Seq(9.0f, 0.0f, 3.0f, 4.5f), "x"),
      (10L, Seq(1.25f, 1.5f, 2.0f, 0.75f), "x"),
      (11L, Seq(2.5f, 2.0f, 4.25f, 1.5f), "x"),
      (12L, Seq(0.0f, 0.25f, 0.5f, 0.0f), "x"),
      (13L, Seq(1.25f, 1.5f, 2.0f, 0.75f), "x"),
      (14L, Seq(2.5f, 2.0f, 4.25f, 1.5f), "x"),
      (15L, Seq(0.0f, 0.25f, 0.5f, 0.0f), "x"),
      (16L, Seq(1.25f, 1.5f, 2.0f, 0.75f), "x"),
      (17L, Seq(2.5f, 2.0f, 4.25f, 1.5f), "x"),
      (18L, Seq(0.0f, 0.25f, 0.5f, 0.0f), "x"),
      (19L, Seq(1.25f, 1.5f, 2.0f, 0.75f), "x"),
      (20L, Seq(2.5f, 2.0f, 4.25f, 1.5f), "x"),
      (21L, Seq(0.0f, 0.25f, 0.5f, 0.0f), "x")))
    val got = Clustering.embed_kmeans(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = Seq(
      (0, 5L, 0L, 3145728L), (1, 5L, 1L, 27787264L), (2, 5L, 2L, 52428800L),
      (3, 2L, 3L, 11534336L), (4, 1L, 4L, 10485760L), (5, 1L, 5L, 9961472L),
      (6, 1L, 6L, 11534336L), (8, 1L, 8L, 15728640L), (9, 1L, 9L, 17301504L))
    assert(got == want,
      s"cluster 7 must be empty (carried centroid) and every other cell " +
        s"must match the reference replay; got $got")
  }

  test("chargrams count astral codepoints as one character (surrogate pairs never split)") {
    // the DuckDB twin's substr/length are codepoint-based; if Spark's were
    // UTF-16-unit-based, an astral char (surrogate pair) would shift every
    // chargram window and split pairs mid-gram — certified here because
    // the shipped corpus carries no astral text for the hash gate to catch
    val out = Seq("😀 ok").toDF("text") // "😀 ok" = 4 codepoints
      .select(TextAnalysis.chargrams(col("text")).as("cg"))
      .first().getSeq[String](0)
    assert(out == Seq("😀 o", " ok"),
      s"astral trigram windows must be codepoint-aligned, got $out")
    val short = Seq("😀🚀").toDF("text") // 2 codepoints
      .select(TextAnalysis.chargrams(col("text")).as("cg"))
      .first().getSeq[String](0)
    assert(short.isEmpty,
      "2 codepoints must yield no trigrams even though they are 4 UTF-16 units")
  }

  test("langid weight artifact round-trips exactly and refuses a corrupt table") {
    val dir = graft.TestPlants.langidDir(spark)
    val base = java.nio.file.Files.createTempDirectory("graftlidw").toString
    TextAnalysis.writeLangidWeights(spark, dir, s"$base/weights")
    val loaded = TextAnalysis.readLangidWeights(spark, s"$base/weights")
    assert(loaded == TextAnalysis.trainLangidWeights(spark, dir, 8),
      "the persisted artifact must load back to the exact trained map")
    // a missing bucket row is a corrupt artifact — mis-scoring every doc
    // silently is the failure mode the loud check exists for
    spark.read.parquet(s"$base/weights")
      .filter(!(col("lang") === "en" && col("bucket") === 3L))
      .write.mode("overwrite").parquet(s"$base/corrupt")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.readLangidWeights(spark, s"$base/corrupt")
    }
    assert(e.getMessage.contains("expected exactly 0..15"))
    // a TRUNCATED artifact (whole language lost — e.g. a missing
    // part-file) is the worst silent failure: a singleton weight set
    // would predict its one language for every document, flooding an
    // "X-only" corpus with the whole multilingual stream
    spark.read.parquet(s"$base/weights")
      .filter(col("lang") =!= "de")
      .write.mode("overwrite").parquet(s"$base/truncated")
    val t = intercept[IllegalArgumentException] {
      TextAnalysis.readLangidWeights(spark, s"$base/truncated")
    }
    assert(t.getMessage.contains("truncated"))
  }

  test("dd_embed_lsh: identical vectors always pair; subset of all-pairs baseline") {
    val dir = tmpEmb(Seq(
      (1L, Seq(0.5f, 0.1f, 0.9f, -0.2f), "a"),
      (2L, Seq(0.5f, 0.1f, 0.9f, -0.2f), "a"), // exact dup of 1 → same bucket
      (3L, Seq(-0.6f, 0.8f, -0.1f, 0.3f), "b")))
    val got = Dedup.dd_embed_lsh(spark, dir, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(math.abs(got(0)._3 - 1.0) < 1e-12)
    // bucketed pairs ⊆ exact all-pairs at the same threshold
    val lsh = Dedup.dd_embed_lsh(spark, "/root/testdata/sf0.001")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.dd_embed_cosine(spark, "/root/testdata/sf0.001")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("simhashFingerprints (lane-packed agg) equals simhash64 expression on real docs") {
    val docs = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.001", "documents")
    val packed = Dedup.simhashFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expr = docs.select(col("doc_id"), simhash64(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed.size == expr.size)
    assert(packed == expr)
  }

  test("dd_cluster_jaccard: disjoint near-dup groups get distinct min-label clusters") {
    val g1a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val g1b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val g2a = "one two three four five six seven eight nine ten"
    val g2b = "one two three four five six seven eight nine eleven"
    val dir = tmpDocs(Seq(
      (1L, g1a, "en", "s", 1L), (2L, g1b, "en", "s", 1L),
      (5L, g2a, "en", "s", 1L), (6L, g2b, "en", "s", 1L),
      (9L, "totally unrelated zebra quark lattice osmosis vortex plasma quill ember", "en", "s", 1L)))
    val got = Dedup.dd_cluster_jaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // each group collapses to its min member; the unrelated doc is no node
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("simhashFingerprints: ~40k-word doc aggregates without ANSI Long overflow") {
    // Regression: the former 4x16-bit lane packing overflowed Long during the
    // vote sum (top lane weight 2^48) at >= 32768 words under Spark 4 ANSI
    // mode. The 2x32-bit packing must match the reference expression exactly.
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val text = (0 until 40000).map(i => vocab(i % vocab.size)).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val packed = Dedup.simhashFingerprints(docs).collect()
    assert(packed.length == 1)
    val expected = docs.select(simhash64(col("text"))).collect()(0).getLong(0)
    assert(packed(0).getLong(1) == expected)
  }

  test("dd_embed_cosine: fails fast above maxVectors, pointing at dd_embed_lsh") {
    val dir = tmpEmb(Seq(
      (1L, Seq(0.5f, 0.1f, 0.9f, -0.2f), "a"),
      (2L, Seq(-0.6f, 0.8f, -0.1f, 0.3f), "b"),
      (3L, Seq(0.2f, -0.7f, 0.4f, 0.6f), "c")))
    val e = intercept[IllegalArgumentException] {
      Dedup.dd_embed_cosine(spark, dir, maxVectors = 2L).collect()
    }
    assert(e.getMessage.contains("dd_embed_lsh"))
    // at-or-below the bound runs normally
    assert(Dedup.dd_embed_cosine(spark, dir, threshold = -1.0, maxVectors = 3L).count() == 3L)
  }

  test("ann_pq: planted-neighbor recall >= 0.8 searching codes only") {
    // same planted-twin construction as the LSH test: a lightly perturbed
    // copy of each query vector must surface in the ADC top-k even though
    // the search never reads a raw corpus vector, only m-code words
    val base = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "embeddings")
    val offset = 1000000L
    val planted = base.filter(col("vec_id") < 8)
      .select((col("vec_id") + offset).as("vec_id"),
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x.cast("double") +
            ((pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") / 1000.0) - 0.5) * 0.08)
            .cast("float")).as("embedding"),
        col("label"))
    val dir = java.nio.file.Files.createTempDirectory("graftpq").toString
    base.unionByName(planted).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.ann_pq(spark, dir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 8L).map(q => (q, q + offset)).toSet
    val recall = (want & got).size.toDouble / want.size
    assert(recall >= 0.8, s"planted-neighbor ADC recall $recall < 0.8")
  }

  test("ann_lsh defaults: planted-neighbor recall >= 0.8, candidate scan <= 25%") {
    // Clustered eval — the case an LSH index exists for. The sf0.01 corpus
    // is uniform on the sphere (strongest pair cosine ≈ 0.38), where recall
    // provably tracks the scanned fraction, so a recall floor there only
    // measures how close the index is to a full scan. Instead: plant one
    // perturbed copy of each query vector (deterministic noise, cosine
    // ≈ 0.98) into the REAL corpus and require the index to find it while
    // scanning a bounded fraction.
    val base = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "embeddings")
    val offset = 1000000L
    val planted = base.filter(col("vec_id") < 8)
      .select((col("vec_id") + offset).as("vec_id"),
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x.cast("double") +
            ((pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") / 1000.0) - 0.5) * 0.08)
            .cast("float")).as("embedding"),
        col("label"))
    val dir = java.nio.file.Files.createTempDirectory("graftplant").toString
    base.unionByName(planted).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 8L).map(q => (q, q + offset)).toSet
    val bf = pairs(Similarity.ann_bruteforce(spark, dir))
    assert(want.subsetOf(bf), "planted twins must be genuine top-k neighbors")
    val lsh = pairs(Similarity.ann_lsh(spark, dir)) // default planes/nProbes
    val recall = (want & lsh).size.toDouble / want.size
    assert(recall >= 0.8, s"planted-neighbor recall $recall < 0.8 at default setting")

    // the same default setting must actually prune: candidates scanned per
    // query ≤ 25 % of the corpus (it defeats the index to probe most of it —
    // the round-2 defaults scanned ~75 %)
    val raw = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "embeddings")
    val n = raw.count()
    val emb = Similarity.withLshBucket(raw, 8).select(col("vec_id"), col("bucket"))
    val probes = raw.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"),
        explode(Similarity.probeBuckets(
          Similarity.planeDots(col("embedding"), 8), 16, 8)).as("bucket"))
    val scanned = emb.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct().count()
    val frac = scanned.toDouble / (8 * n)
    assert(frac <= 0.25, s"default setting scans $frac of the corpus")

    // multi-probe strictly widens the single-probe candidate set
    val bfu = pairs(Similarity.ann_bruteforce(spark, "/root/testdata/sf0.01"))
    val multi = pairs(Similarity.ann_lsh(spark, "/root/testdata/sf0.01"))
    val single = pairs(Similarity.ann_lsh(spark, "/root/testdata/sf0.01", nProbes = 1))
    assert((bfu & multi).size >= (bfu & single).size)
  }

  test("ann_ivf: recall >= 0.8 vs bruteforce; ranks dense and self excluded") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.ann_bruteforce(spark, "/root/testdata/sf0.01"))
    val rows = Similarity.ann_ivf(spark, "/root/testdata/sf0.01").collect()
    val ivf = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall < 0.8")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length))
      assert(byRank.forall(_.getLong(2) != q))
      val scores = byRank.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("dd_semdedup: a planted within-cluster twin is flagged; keepers partition members") {
    val base = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "embeddings")
    val offset = 1000000L
    // a barely-perturbed copy of vector 0 lands in vector 0's cluster and
    // must be flagged as its semantic duplicate (higher id ⇒ it, not the
    // original, is the flagged member)
    val planted = base.filter(col("vec_id") === 0)
      .select((col("vec_id") + offset).as("vec_id"),
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x.cast("double") +
            ((pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") / 1000.0) - 0.5) * 0.01)
            .cast("float")).as("embedding"),
        col("label"))
    val dir = java.nio.file.Files.createTempDirectory("graftsem").toString
    base.unionByName(planted).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Dedup.dd_semdedup(spark, dir).collect()
    // invariants: every cluster's keepers + dups = members; dup counts bound
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), s"members != dups + keepers: $r")
      assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1))
    }
    // the planted twin (cosine to vec 0 ≈ 0.999, id above every base id)
    // must be flagged in ITS cluster: centroids are the 10 lowest vec_ids,
    // so base memberships are unchanged — exactly one cluster gains one
    // member, and that same cluster's dup count rises by exactly one (the
    // twin, flagged once), with every other cluster row identical
    def byCluster(df: org.apache.spark.sql.DataFrame): Map[Int, (Long, Long)] =
      df.collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base2 = byCluster(Dedup.dd_semdedup(spark, "/root/testdata/sf0.01"))
    val plant = byCluster(Dedup.dd_semdedup(spark, dir))
    val changed = plant.filter { case (c, v) => base2(c) != v }
    assert(changed.size == 1, s"exactly one cluster changes: $changed")
    val (c, (members, dups)) = changed.head
    assert(members == base2(c)._1 + 1, "the twin joins its cluster")
    assert(dups == base2(c)._2 + 1, "the twin itself is flagged as the duplicate")
    // quadratic-by-construction guard: a cell above the bound fails fast
    val e = intercept[IllegalArgumentException] {
      Dedup.dd_semdedup(spark, "/root/testdata/sf0.001", maxCellVectors = 1L)
    }
    assert(e.getMessage.contains("quadratic per cell"))
  }

  test("ann_ivfpq_refined: exact re-rank never loses recall vs plain ADC; candidates respected") {
    val dir = "/root/testdata/sf0.01"
    def hits(df: org.apache.spark.sql.DataFrame) = df.select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.ann_bruteforce(spark, dir))
    val adc = hits(Similarity.ann_ivfpq(spark, dir))
    val refinedDf = Similarity.ann_ivfpq_refined(spark, dir)
    val refined = hits(refinedDf)
    def recall(got: Set[(Long, Long)]) = (truth & got).size.toDouble / truth.size
    assert(recall(refined) >= recall(adc),
      s"refine must not lose recall: ${recall(refined)} < ${recall(adc)}")
    // the refined top-k draws only from the refine-deep ADC candidate set
    val cands = hits(Similarity.ann_ivfpq(spark, dir, k = 40))
    assert(refined.subsetOf(cands))
    // exact cosine order: non-increasing within each query, ranks dense
    val rows = refinedDf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4))
    }
  }

  test("searchIvfPqIndexRefined: persisted two-stage search — candidates respected, no recall loss") {
    val dir = "/root/testdata/sf0.01"
    val path = java.nio.file.Files.createTempDirectory("graftivfrefine").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    def hits(df: org.apache.spark.sql.DataFrame) = df.select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.ann_bruteforce(spark, dir))
    val adc = hits(Similarity.searchIvfPqIndex(spark, path, queries))
    val refinedDf = Similarity.searchIvfPqIndexRefined(spark, path, queries, emb)
    val refined = hits(refinedDf)
    def recall(got: Set[(Long, Long)]) = (truth & got).size.toDouble / truth.size
    assert(recall(refined) >= recall(adc),
      s"persisted refine must not lose recall: ${recall(refined)} < ${recall(adc)}")
    // top-k draws only from the refine-deep distributed ADC candidates
    val cands = hits(Similarity.searchIvfPqIndexDistributed(spark, path, queries, k = 40))
    assert(refined.subsetOf(cands))
    // dense ranks, exact-cosine non-increasing order
    val rows = refinedDf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4))
    }
  }

  test("ann_ivfpq: planted-neighbor recall >= 0.8 AND scan fraction < 15% of codes") {
    // the composed index must deliver BOTH halves at once: find the planted
    // twin (recall, like ann_pq's spec) while touching only the probed
    // lists' code words (scan fraction, like ann_lsh's spec)
    val base = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "embeddings")
    val offset = 1000000L
    val planted = base.filter(col("vec_id") < 8)
      .select((col("vec_id") + offset).as("vec_id"),
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x.cast("double") +
            ((pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") / 1000.0) - 0.5) * 0.08)
            .cast("float")).as("embedding"),
        col("label"))
    val dir = java.nio.file.Files.createTempDirectory("graftivfpq").toString
    base.unionByName(planted).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.ann_ivfpq(spark, dir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 8L).map(q => (q, q + offset)).toSet
    val recall = (want & got).size.toDouble / want.size
    assert(recall >= 0.8, s"planted-neighbor IVFPQ recall $recall < 0.8")

    // scan-fraction audit at defaults (nlist=32, nprobe=3): candidates per
    // query = the probed lists' populations; expected ~nprobe/nlist ≈ 9.4 %
    // — assert < 15 % so the composed index genuinely prunes (ann_pq alone
    // scans 100 % of codes)
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val (cents, _, coded) = Similarity.ivfpqIndex(emb, nlist = 32, m = 8,
      codes = 16, iters = 2, sub = dims / 8)
    val listSizes = coded.groupBy("cid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 8).select("vec_id", "embedding")
      .collect().map(_.getSeq[Float](1).map(_.toDouble))
    val scanned = queries.map { q =>
      cents.zipWithIndex.map { case (c, i) =>
        (q.zip(c).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }, i)
      }.sorted.take(3).map { case (_, cid) => listSizes.getOrElse(cid, 0L) }.sum
    }.sum
    val frac = scanned.toDouble / (queries.length * n)
    assert(frac < 0.15, s"IVFPQ scans $frac of the corpus' codes")
  }

  test("native word chunks are byte-identical to the composed HOF form") {
    // dd_para's oracle md5-hashes every chunk: byte equality is the bar
    import graft.functions.{TextFunctions, WordChunks}
    def composed(cw: Int) = {
      val w = TextFunctions.words(col("text"))
      transform(
        sequence(lit(0), floor((size(w) - 1) / cw).cast("int")),
        i => concat_ws(" ", slice(w, i * cw + 1, lit(cw))))
    }
    val docs = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "documents")
    for (cw <- Seq(1, 16)) {
      val both = docs.select(WordChunks.of(col("text"), cw).as("fast"),
        composed(cw).as("ref"))
      assert(both.filter(col("fast") =!= col("ref")).count() == 0, s"cw=$cw diverges")
    }
    val edge = spark.sql("SELECT * FROM VALUES (''), ('one'), ('a b c') AS v(text)")
      .select(WordChunks.of(col("text"), 2).as("fast"), composed(2).as("ref")).collect()
    edge.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("native simhash64 and winnowSelect are bit-identical to their composed forms") {
    import graft.functions.TextFunctions._
    val docs = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "documents")
    val sh = docs.select(simhash64(col("text")).as("fast"),
      simhash64Composed(col("text")).as("ref"))
    assert(sh.filter(col("fast") =!= col("ref")).count() == 0)
    val edge = spark.sql("SELECT * FROM VALUES (''), ('one'), ('a a a b') AS v(text)")
      .select(simhash64(col("text")).as("fast"), simhash64Composed(col("text")).as("ref"))
      .collect()
    edge.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // winnowing: windows, clamped tail, first-occurrence dedup, empty input
    val hs = docs.select(col("doc_id"),
      transform(shingles(col("text"), 3), x => xxhash64(x)).as("hs"))
    val wn = hs.select(winnowSelect(col("hs"), 4).as("fast"),
      winnowSelectComposed(col("hs"), 4).as("ref"))
    assert(wn.filter(col("fast") =!= col("ref")).count() == 0)
    val wedge = spark.sql(
      "SELECT * FROM VALUES (CAST(array() AS array<bigint>)), (array(5L)), (array(3L,1L,1L,4L,1L,5L)) AS v(hs)")
      .select(winnowSelect(col("hs"), 4).as("fast"),
        winnowSelectComposed(col("hs"), 4).as("ref")).collect()
    wedge.foreach(r => assert(r.getSeq[Any](0) == r.getSeq[Any](1), r.toString))
  }

  test("native normalize is string-identical to the composed regex form") {
    // normalize feeds md5 digests in oracle-checked operators (tx_norm,
    // pipeline_curate/train) — the byte-pass must reproduce the regex chain
    // exactly, including unicode stripping and lowercase-to-ascii cases
    import graft.functions.TextFunctions.{normalize, normalizeComposed}
    val docs = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "documents")
    val both = docs.select(normalize(col("text")).as("fast"),
      normalizeComposed(col("text")).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
    val edge = spark.sql(
      """SELECT * FROM VALUES (''), ('  '), ('A  B!!c'), ('a\tb'),
        |('Ünïcode — stripped'), ('ABC123  '), ('..a..'), ('É K à 9')
        |AS v(text)""".stripMargin)
    val e = edge.select(normalize(col("text")).as("fast"),
      normalizeComposed(col("text")).as("ref")).collect()
    e.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("native shingles are bit-identical to the composed HOF form") {
    // shingles feed md5/xxhash64 digests in oracle-checked operators — any
    // byte difference (split semantics, join, the fewer-than-n case) breaks
    // hash parity corpus-wide
    import graft.functions.TextFunctions.{shingles, shinglesComposed}
    val docs = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "documents")
    for (n <- Seq(1, 3, 8)) {
      val both = docs.select(shingles(col("text"), n).as("fast"),
        shinglesComposed(col("text"), n).as("ref"))
      assert(both.filter(col("fast") =!= col("ref")).count() == 0, s"n=$n diverges")
    }
    // edge cases: empty text, single word, text shorter than n, double space
    val edge = spark.sql(
      "SELECT * FROM VALUES (''), ('one'), ('a b'), ('x  y z') AS v(text)")
    val e = edge.select(shingles(col("text"), 3).as("fast"),
      shinglesComposed(col("text"), 3).as("ref")).collect()
    e.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("native minhash signature is bit-identical to the composed HOF form") {
    // the streaming gate's per-row signature: the native rehash must equal
    // the xxhash64-Column composition exactly, including all-null families
    // for an empty shingle array
    import graft.functions.TextFunctions.{hashedShingles, minhashComposed, minhash}
    val docs = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "documents")
      .withColumn("hs", hashedShingles(col("text"), 3))
    val both = docs.select(
      minhash(col("hs"), 32).as("fast"),
      minhashComposed(col("hs"), 32).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
    val r = both.limit(3).collect()
    r.foreach(row => assert(row.getSeq[Long](0) == row.getSeq[Long](1)))
    // empty input → k null families on both forms
    val empty = spark.sql("SELECT CAST(array() AS array<bigint>) AS hs")
    val e = empty.select(minhash(col("hs"), 4).as("fast"),
      minhashComposed(col("hs"), 4).as("ref")).collect().head
    assert(e.getSeq[Any](0) == Seq(null, null, null, null))
    assert(e.getSeq[Any](0) == e.getSeq[Any](1))
  }

  test("native planeDots is bit-identical to the composed HOF form") {
    // the native expression re-derives the plane matrix from XXH64 directly;
    // every margin must equal the xxhash64-Column composition EXACTLY or
    // bucket assignments (and thus every LSH index) silently change
    val emb = graft.sources.Tables.loadParallel(spark, "/root/testdata/sf0.01", "embeddings")
    val both = emb.select(
      Similarity.planeDots(col("embedding"), 8).as("fast"),
      Similarity.planeDotsComposed(col("embedding"), 8).as("ref"))
    val bad = both.filter(col("fast") =!= col("ref")).count()
    assert(bad == 0, s"$bad rows diverge between native and composed planeDots")
    // and spot-check actual doubles, not just SQL equality semantics
    val r = both.limit(5).collect()
    r.foreach { row =>
      assert(row.getSeq[Double](0) == row.getSeq[Double](1))
    }
  }

  test("IVFxPQ index persists: search equals the inline operator; probed lists prune the scan") {
    // build once / search many: deterministic training means the persisted-
    // index search must be IDENTICAL to the inline operator, and the probed
    // list ids (known driver-side) must prune the partitioned codes scan
    val dir = "/root/testdata/sf0.01"
    val path = java.nio.file.Files.createTempDirectory("graftivfidx").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    val queries = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
      .filter(col("vec_id") < 8)
    val fromIndex = Similarity.searchIvfPqIndex(spark, path, queries)
    val inline = Similarity.ann_ivfpq(spark, dir)
    assert(fromIndex.collect().map(_.toSeq).toSeq == inline.collect().map(_.toSeq).toSeq)
    val p = fromIndex.queryExecution.sparkPlan.toString
    assert(p.contains("PartitionFilters: [cid"),
      s"probed lists must prune the partitioned index scan:\n$p")
  }

  test("sharded index: shared-quantizer shards search bit-identical to the single index; health rolls up per shard") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val single = java.nio.file.Files.createTempDirectory("graftivfsingle").toString
    val base = java.nio.file.Files.createTempDirectory("graftivfshards").toString
    Similarity.writeIvfPqIndexFrom(spark, emb, single)
    val shards = Similarity.writeIvfPqIndexShards(spark, emb, base, 3)
    assert(shards.size == 3)
    // every shard is a full index artifact: codes + both sidecars + health
    shards.foreach { p =>
      Seq("codes", "centroids", "codebooks", "health").foreach { part =>
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p, part)),
          s"$p missing $part")
      }
    }
    // shards partition the corpus: no row lost, none duplicated
    val total = shards.map(p =>
      spark.read.parquet(s"$p/codes").count()).sum
    assert(total == emb.count())
    // PARITY: union-of-shards top-k == single-index top-k, bit for bit
    // (shared sidecars => identical codes => identical ADC distances)
    val queries = emb.filter(col("vec_id") < 8)
    val sharded = Similarity.searchIvfPqIndexSharded(spark, shards, queries)
      .collect().map(_.toSeq).toSeq
    val whole = Similarity.searchIvfPqIndexDistributed(spark, single, queries)
      .collect().map(_.toSeq).toSeq
    assert(sharded == whole, "sharded search must equal the single index")
    // health roll-up: one report, one block per shard; the routed delta
    // counts sum to the delta size; shard column leads
    val delta = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val health = Similarity.indexHealthSharded(spark, shards, delta)
    assert(health.columns.head == "shard")
    val perShard = health.groupBy("shard")
      .agg(sum(coalesce(col("delta_n"), lit(0L))).as("dn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perShard.keySet == Set(0L, 1L, 2L))
    assert(perShard.values.sum == delta.count())
    // the delta routed per shard matches the shared routing definition
    val want = delta.groupBy(pmod(col("vec_id"), lit(3L)).as("shard"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perShard == want)
    // APPEND parity: the delta appended shard-routed vs whole into the
    // single index — post-append sharded search still equals the single
    // index (shared sidecars keep every appended code comparable)
    Similarity.appendToIvfPqIndexSharded(spark, shards, delta)
    Similarity.appendToIvfPqIndex(spark, single, delta)
    val totalAfter = shards.map(p =>
      spark.read.parquet(s"$p/codes").count()).sum
    assert(totalAfter == emb.count() + delta.count())
    val shardedAfter = Similarity.searchIvfPqIndexSharded(spark, shards, queries)
      .collect().map(_.toSeq).toSeq
    val wholeAfter = Similarity.searchIvfPqIndexDistributed(spark, single, queries)
      .collect().map(_.toSeq).toSeq
    assert(shardedAfter == wholeAfter,
      "post-append sharded search must equal the single index")
    // COMPACT closes the lifecycle: rows and search results survive; a
    // reordered path list is fine (identity is path-parsed), a partial
    // one refuses loudly
    Similarity.compactIvfPqIndexSharded(spark, shards.reverse)
    assert(shards.map(p => spark.read.parquet(s"$p/codes").count()).sum
      == emb.count() + delta.count())
    val shardedCompacted = Similarity.searchIvfPqIndexSharded(spark, shards, queries)
      .collect().map(_.toSeq).toSeq
    assert(shardedCompacted == wholeAfter)
    val e = intercept[IllegalArgumentException] {
      Similarity.compactIvfPqIndexSharded(spark, shards.take(2))
    }
    assert(e.getMessage.contains("written with 3 shards but 2"),
      s"prefix-subset of a deployment must refuse via the persisted " +
        s"shard-count marker, got: ${e.getMessage}")
  }

  test("appendOrRetrainSharded: the drifted shard retrains alone while siblings append; refined sharded search stays exact") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("graftaors").toString
    val single = java.nio.file.Files.createTempDirectory("graftaorsingle").toString
    val shards = Similarity.writeIvfPqIndexShards(spark, emb, base, 3)
    Similarity.writeIvfPqIndexFrom(spark, emb, single)
    def slice(df: org.apache.spark.sql.DataFrame, i: Int) =
      df.filter(pmod(col("vec_id"), lit(3L)) === i.toLong)
    // ROUND 1 — no drift: exact corpus copies under fresh ids. Every shard
    // must take the append (err_ratio ~ 1), and because the decision never
    // touches the shared sidecars, plain sharded search keeps its
    // bit-parity with a single index that appended the same delta.
    val mild = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1200000L).as("vec_id"), col("embedding"))
    val allVecs1 = emb.unionByName(mild)
    val d1 = Similarity.appendOrRetrainSharded(spark, shards, mild, allVecs1)
    assert(d1.map(_._1) == Seq(0, 1, 2), s"all shards priced, got $d1")
    assert(d1.forall(!_._2), s"an undrifted delta must append everywhere: $d1")
    assert(d1.forall(_._3 <= 2.0), s"copy-of-corpus err_ratio must be low: $d1")
    Similarity.appendToIvfPqIndex(spark, single, mild)
    val queries = emb.filter(col("vec_id") < 8)
    assert(Similarity.searchIvfPqIndexSharded(spark, shards, queries)
        .collect().map(_.toSeq).toSeq ==
      Similarity.searchIvfPqIndexDistributed(spark, single, queries)
        .collect().map(_.toSeq).toSeq,
      "all-append decisions keep sharded search bit-identical to the single index")
    // ROUND 2 — drift planted ONLY in shard 1's slice: +2.0 on every
    // component (the idx_health planted-drift strength). Shard 1 must
    // retrain alone; shards 0 and 2 must append their undrifted slices.
    val delta2 = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 2400000L).as("vec_id"),
        when(pmod(col("vec_id") + 2400000L, lit(3L)) === 1L,
          transform(col("embedding"), x => (x + lit(2.0f)).cast("float")))
          .otherwise(col("embedding")).as("embedding"))
    val allVecs2 = allVecs1.unionByName(delta2)
    val d2 = Similarity.appendOrRetrainSharded(spark, shards, delta2, allVecs2)
    val byShard = d2.map(d => d._1 -> d).toMap
    assert(byShard.keySet == Set(0, 1, 2))
    assert(byShard(1)._2 && byShard(1)._3 > 2.0,
      s"the planted-drift shard must retrain: ${byShard(1)}")
    assert(!byShard(0)._2 && !byShard(2)._2,
      s"undrifted siblings must append, not retrain: $d2")
    // row conservation per shard: a retrained shard re-encodes its FULL
    // corpus-of-record slice; an appended shard is base + its delta rows —
    // both equal the allVecs2 slice count
    (0 until 3).foreach { i =>
      assert(spark.read.parquet(s"${shards(i)}/codes").count() ==
        slice(allVecs2, i).count(), s"shard $i row count after decision")
    }
    // the deployment is now HETEROGENEOUS (shard 1 has fresher sidecars) —
    // the exact-re-rank search arbitrates across quantizers: a query that
    // has an exact copy in the corpus must get that copy back at rank 1
    // with cos == 1.0, whether the copy lives in a retrained or an
    // appended shard. Query ids are fresh (they must not collide with the
    // candidate they should retrieve — the search drops self-matches).
    val drifted = delta2.filter(pmod(col("vec_id"), lit(3L)) === 1L).limit(2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val undrifted = delta2.filter(pmod(col("vec_id"), lit(3L)) =!= 1L).limit(2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(drifted.nonEmpty && undrifted.nonEmpty)
    val probe = (drifted ++ undrifted).zipWithIndex
      .map { case ((id, e), qi) => (3000000L + qi, e, id) }
    val probeDf = probe.map { case (qid, e, _) => (qid, e) }.toSeq
      .toDF("vec_id", "embedding")
    val hits = Similarity.searchIvfPqIndexShardedRefined(
        spark, shards, probeDf, allVecs2, k = 3)
      .filter(col("rank") === 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    probe.foreach { case (qid, _, copyId) =>
      val (gotId, cos) = hits(qid)
      assert(math.abs(cos - 1.0) < 1e-9,
        s"query $qid: rank-1 must be an exact copy, got cos=$cos id=$gotId")
      // a DRIFTED probe's exact copy is unique (the +2.0 shift moved it
      // away from every original), so the retrained shard must surface
      // precisely that row; an undrifted probe legitimately ties with its
      // original corpus row and the smallest vec_id wins the tie-break
      if (qid - 3000000L < drifted.length)
        assert(gotId == copyId,
          s"drifted query $qid: expected its copy $copyId at rank 1, got $gotId")
    }
    // plumbing parity: a 1-shard deployment IS a single index, so the
    // refined sharded search must be bit-identical to the single-index
    // refined search over an identically-trained pristine index
    // (deterministic training: same frame + same params => same sidecars)
    val oneBase = java.nio.file.Files.createTempDirectory("graftaorone").toString
    val one = Similarity.writeIvfPqIndexShards(spark, emb, oneBase, 1)
    val pristine = java.nio.file.Files.createTempDirectory("graftaorprst").toString
    Similarity.writeIvfPqIndexFrom(spark, emb, pristine)
    assert(Similarity.searchIvfPqIndexShardedRefined(spark, one, queries, emb)
        .collect().map(_.toSeq).toSeq ==
      Similarity.searchIvfPqIndexRefined(spark, pristine, queries, emb)
        .collect().map(_.toSeq).toSeq,
      "1-shard refined search must equal the single-index refined search")
    // an entirely empty delta fails fast with the single-index contract
    // (a broken upstream filter must not log successful no-op ticks)
    val emptyDelta = intercept[IllegalArgumentException] {
      Similarity.appendOrRetrainSharded(spark, shards,
        emb.filter(col("vec_id") < 0), allVecs2)
    }
    assert(emptyDelta.getMessage.contains("skip the tick"))
  }

  test("appendOrRetrain: a forced retrain preserves the index's own geometry, not the build defaults") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graftgeo").toString
    // custom geometry AND custom depth: nlist=8, m=4 (sub=16 on 64 dims),
    // codes=8, iters=3 — none of them writeIvfPqIndexFrom's defaults
    Similarity.writeIvfPqIndexFrom(spark, emb, path,
      nlist = 8, m = 4, codes = 8, iters = 3)
    val drifted = emb.select((col("vec_id") + 500000L).as("vec_id"),
      transform(col("embedding"), x => (x + lit(5.0f)).cast("float")).as("embedding"))
    val allVecs = emb.unionByName(drifted)
    val (retrained, ratio) =
      Similarity.appendOrRetrain(spark, path, drifted, allVecs)
    assert(retrained && ratio > 2.0, s"the +5.0 shift must force a retrain, got ($retrained, $ratio)")
    val nlistAfter = spark.read.parquet(s"$path/centroids").count()
    val books = spark.read.parquet(s"$path/codebooks")
    val mAfter = books.select("s").distinct().count()
    val codesAfter = books.select("j").distinct().count()
    assert((nlistAfter, mAfter, codesAfter) == ((8L, 4L, 8L)),
      s"retrain-in-place must keep the deployment's geometry, " +
        s"got (nlist=$nlistAfter, m=$mAfter, codes=$codesAfter)")
    // DEPTH preservation: deterministic training means the retrained
    // sidecars must be bit-identical to a reference build of the same
    // corpus at the PERSISTED depth (iters=3, from the train_meta
    // sidecar) — a silent fallback to the default 2 would diverge
    val ref = java.nio.file.Files.createTempDirectory("graftgeoref").toString
    Similarity.writeIvfPqIndexFrom(spark, allVecs, ref,
      nlist = 8, m = 4, codes = 8, iters = 3)
    def sidecars(p: String) = (
      spark.read.parquet(s"$p/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq,
      spark.read.parquet(s"$p/codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)).toSeq)
    assert(sidecars(path) == sidecars(ref),
      "retrain must train at the persisted depth (train_meta), not the default")
    // and the retrained index still serves searches end to end
    assert(Similarity.searchIvfPqIndexDistributed(spark, path,
      emb.filter(col("vec_id") < 4)).count() > 0)
  }

  test("re-sharding a base path: stale surplus shards refuse; markers refresh; conflicting markers refuse") {
    val emb = graft.sources.Tables
      .loadParallel(spark, "/root/testdata/sf0.01", "embeddings")
      .filter(col("vec_id") < 200)
    // smaller → refuse: the old deployment's surplus shard dir would
    // otherwise survive as an orphan holding rows the new modulus never
    // routes to
    val baseA = java.nio.file.Files.createTempDirectory("graftreshA").toString
    Similarity.writeIvfPqIndexShards(spark, emb, baseA, 3)
    val down = intercept[IllegalArgumentException] {
      Similarity.writeIvfPqIndexShards(spark, emb, baseA, 2)
    }
    assert(down.getMessage.contains("shard dirs beyond"),
      s"re-shard smaller must refuse, got: ${down.getMessage}")
    // larger → the old _nshards_2 markers must be cleared, not accumulated:
    // each shard dir ends with exactly the new marker and routed entry
    // points accept the new deployment
    val baseB = java.nio.file.Files.createTempDirectory("graftreshB").toString
    Similarity.writeIvfPqIndexShards(spark, emb, baseB, 2)
    val grown = Similarity.writeIvfPqIndexShards(spark, emb, baseB, 3)
    grown.foreach { p =>
      val markers = new java.io.File(p).listFiles()
        .map(_.getName).filter(_.startsWith("_nshards_")).toSeq
      assert(markers == Seq("_nshards_3"),
        s"$p must carry exactly the new marker, got $markers")
    }
    Similarity.compactIvfPqIndexSharded(spark, grown) // accepts the refreshed markers
    // conflicting markers (a layout no writer produces any more) → refuse
    // loudly instead of trusting either count — planted in a NON-head
    // shard, because every dir is validated, not just the first listed
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(grown(1), "_nshards_9"))
    val conflict = intercept[IllegalArgumentException] {
      Similarity.compactIvfPqIndexSharded(spark, grown)
    }
    assert(conflict.getMessage.contains("_nshards_* markers"),
      s"conflicting markers must refuse, got: ${conflict.getMessage}")
  }

  test("appendToIvfPqIndex: append(delta) equals a fixed-codebook rebuild; pruning survives appended files") {
    def copyDir(from: String, to: String): Unit = {
      val src = java.nio.file.Paths.get(from)
      java.nio.file.Files.walk(src).forEach { p =>
        val dst = java.nio.file.Paths.get(to).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      }
    }
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val split = emb.agg(max(col("vec_id"))).first().getLong(0) / 2
    val pathInc = java.nio.file.Files.createTempDirectory("graftivfinc").toString
    Similarity.writeIvfPqIndexFrom(spark, emb.filter(col("vec_id") < split), pathInc)
    // the fixed-codebook rebuild: SAME sidecars, every vector (base and
    // delta) encoded through the append path into a fresh codes layout
    val pathReb = java.nio.file.Files.createTempDirectory("graftivfreb").toString
    copyDir(s"$pathInc/centroids", s"$pathReb/centroids")
    copyDir(s"$pathInc/codebooks", s"$pathReb/codebooks")
    Similarity.appendToIvfPqIndex(spark, pathReb, emb)
    // the incremental path: delta appended onto the BUILT base index —
    // build-time codes and append-time codes must agree row for row
    Similarity.appendToIvfPqIndex(spark, pathInc, emb.filter(col("vec_id") >= split))
    def codesOf(path: String) = spark.read.parquet(s"$path/codes")
      .collect().map(r => (r.getLong(0), r.getAs[Int]("cid"), r.getSeq[Int](1)))
      .sortBy(_._1).toSeq
    assert(codesOf(pathInc) == codesOf(pathReb))
    // and the search surface agrees too, with partition pruning intact
    // across the mix of original and appended files
    val queries = emb.filter(col("vec_id") < 8)
    val inc = Similarity.searchIvfPqIndex(spark, pathInc, queries)
    assert(inc.collect().map(_.toSeq).toSeq ==
      Similarity.searchIvfPqIndex(spark, pathReb, queries).collect().map(_.toSeq).toSeq)
    val p = inc.queryExecution.sparkPlan.toString
    assert(p.contains("PartitionFilters: [cid"),
      s"probed lists must still prune after appends:\n$p")
    // a retried delta must fail loudly, not silently duplicate index rows
    val again = intercept[IllegalArgumentException](
      Similarity.appendToIvfPqIndex(spark, pathInc, emb.filter(col("vec_id") >= split)))
    assert(again.getMessage.contains("overlaps"))
    // and so must a delta that repeats vec_ids internally (e.g. an
    // upstream retry concatenated into one batch) — even when none of
    // them exist in the index yet
    val fresh = emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .limit(4)
    val internal = intercept[IllegalArgumentException](
      Similarity.appendToIvfPqIndex(spark, pathInc, fresh.unionByName(fresh)))
    assert(internal.getMessage.contains("repeats"))
  }

  test("compactIvfPqIndex: one file per list after appends; rows and search results identical") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val split = emb.agg(max(col("vec_id"))).first().getLong(0) / 2
    val path = java.nio.file.Files.createTempDirectory("graftivfcmp").toString
    Similarity.writeIvfPqIndexFrom(spark, emb.filter(col("vec_id") < split), path)
    Similarity.appendToIvfPqIndex(spark, path, emb.filter(col("vec_id") >= split))
    def layout() = java.nio.file.Files.walk(java.nio.file.Paths.get(path, "codes"))
      .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
      .groupBy(f => f.split("/").takeWhile(!_.endsWith(".parquet")).last)
      .map { case (cid, fs) => cid -> fs.length }
    def codes() = spark.read.parquet(s"$path/codes")
      .collect().map(r => (r.getLong(0), r.getAs[Int]("cid"), r.getSeq[Int](1)))
      .sortBy(_._1).toSeq
    val queries = emb.filter(col("vec_id") < 8)
    val preCodes = codes()
    val preSearch = Similarity.searchIvfPqIndex(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    assert(layout().exists(_._2 > 1), "append should have left multi-file lists")
    // the compaction signal is readable from the health report itself
    val preFiles = Similarity.indexListStats(spark, path)
      .select("n_files").collect().map(_.getLong(0))
    assert(preFiles.exists(_ > 1L))
    Similarity.compactIvfPqIndex(spark, path)
    assert(layout().forall(_._2 == 1), s"post-compact layout: ${layout()}")
    assert(Similarity.indexListStats(spark, path)
      .select("n_files").collect().map(_.getLong(0)).forall(_ == 1L))
    assert(codes() == preCodes)
    assert(Similarity.searchIvfPqIndex(spark, path, queries)
      .collect().map(_.toSeq).toSeq == preSearch)
    // the writer lock is gone — a follow-up append must succeed
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_append.lock")))
  }

  test("searchIvfPqIndexDistributed: bit-identical to the driver-side path; driver path guards its batch bound") {
    val dir = "/root/testdata/sf0.01"
    val path = java.nio.file.Files.createTempDirectory("graftivfdist").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    val queries = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
      .filter(col("vec_id") < 8)
    // every double op in the distributed probe tables replays the driver
    // path's operation order, so top-k must be IDENTICAL — ranks, ids, and
    // raw distance doubles
    val driver = Similarity.searchIvfPqIndex(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    val dist = Similarity.searchIvfPqIndexDistributed(spark, path, queries)
      .collect().map(_.toSeq).toSeq
    assert(dist == driver)
    // the driver-side path must fail fast past its bound, naming the
    // distributed path — not OOM building probe tables
    val ex = intercept[IllegalArgumentException](
      Similarity.searchIvfPqIndex(spark, path, queries, maxDriverQueries = 4))
    assert(ex.getMessage.contains("maxDriverQueries") &&
      ex.getMessage.contains("searchIvfPqIndexDistributed"))
  }

  test("indexDriftStats: a planted off-distribution delta shows error growth; list stats census the codes") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graftivfdrift").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    def weightedMeanErr(stats: org.apache.spark.sql.DataFrame): Double = {
      val r = stats.agg(sum(col("mean_err") * col("n")), sum(col("n"))).first()
      r.getDouble(0) / r.getLong(1)
    }
    // in-distribution probe: the corpus the index was built from
    val base = weightedMeanErr(Similarity.indexDriftStats(spark, path, emb))
    // planted drift: the same vectors shifted far off every centroid —
    // residuals blow up and the codebooks price them coarsely
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => (x + lit(5.0f)).cast("float")).as("embedding"))
    val drifted = weightedMeanErr(Similarity.indexDriftStats(spark, path, shifted))
    assert(drifted > base * 5,
      s"planted drift must inflate quantization error (base=$base drifted=$drifted)")
    // list stats: one codes scan, full census — counts sum to the corpus,
    // shares sum to 1
    val ls = Similarity.indexListStats(spark, path)
    val tot = ls.agg(sum("n"), sum("share")).first()
    assert(tot.getLong(0) == emb.count())
    assert(math.abs(tot.getDouble(1) - 1.0) < 1e-9)
  }

  test("indexHealth: one-call report joins occupancy, base reference, and delta drift; degrades on pre-sidecar indexes") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graftivfhealth").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => (x + lit(5.0f)).cast("float")).as("embedding"))
    val h = Similarity.indexHealth(spark, path, shifted)
    assert(h.columns.toSeq == Seq("cid", "n", "share", "n_files", "base_n", "base_mean_err",
      "base_p95_err", "delta_n", "delta_mean_err", "delta_p95_err", "err_ratio"))
    val rows = h.collect()
    // one row per list; occupancy and delta both census the corpus
    assert(rows.map(_.getAs[Long]("n")).sum == emb.count())
    assert(rows.map(_.getAs[Long]("delta_n")).sum == emb.count())
    // the base reference came from the build-time health sidecar, priced on
    // the training corpus itself — counts agree with occupancy per list
    assert(rows.forall(r => r.getAs[Long]("base_n") == r.getAs[Long]("n")))
    // planted drift: corpus-weighted err_ratio must blow past the ~2×
    // rebuild threshold the README recipe names
    val wRatio = rows.map(r => r.getAs[Double]("err_ratio") * r.getAs[Long]("delta_n")).sum /
      rows.map(_.getAs[Long]("delta_n")).sum
    assert(wRatio > 2.0, s"planted +5.0 shift must cross the rebuild threshold (got $wRatio)")
    // an in-distribution delta sits near ratio 1 — the healthy reading
    val healthy = Similarity.indexHealth(spark, path, emb).collect()
    val wHealthy = healthy.map(r => r.getAs[Double]("err_ratio") * r.getAs[Long]("delta_n")).sum /
      healthy.map(_.getAs[Long]("delta_n")).sum
    assert(math.abs(wHealthy - 1.0) < 1e-9, s"training corpus vs its own build: $wHealthy")
    // a pre-sidecar index (no health dir) degrades to null base columns
    val legacy = java.nio.file.Files.createTempDirectory("graftivflegacy").toString
    Similarity.writeIvfPqIndex(spark, dir, legacy)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$legacy/health"))
    val lh = Similarity.indexHealth(spark, legacy, shifted).collect()
    assert(lh.forall(r => r.isNullAt(r.fieldIndex("base_mean_err")) &&
      r.isNullAt(r.fieldIndex("err_ratio"))))
    // an off-distribution delta concentrates into few lists: touched lists
    // carry delta stats, untouched ones null — never an error
    assert(lh.exists(r => !r.isNullAt(r.fieldIndex("delta_mean_err"))))
    assert(lh.forall(r =>
      r.isNullAt(r.fieldIndex("delta_n")) == r.isNullAt(r.fieldIndex("delta_mean_err"))))
  }

  test("searchIvfPqIndexFiltered: true top-k of the filtered set; range predicate pushed to the codes scan") {
    val dir = "/root/testdata/sf0.01"
    val path = java.nio.file.Files.createTempDirectory("graftivffilt").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val pred = col("vec_id") % 2 === 0
    val got = Similarity.searchIvfPqIndexFiltered(spark, path, queries, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.forall(_._3 % 2 == 0),
      "every hit must satisfy the predicate")
    // independent semantics oracle: an exhaustive plain search (k = all),
    // post-filtered and re-ranked per query, must reproduce the filtered
    // top-k exactly — pre-filter vs post-filter can only differ when k
    // truncates, and the exhaustive run removes the truncation
    val deep = Similarity.searchIvfPqIndexDistributed(spark, path, queries,
        k = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val expect = deep.filter(_._2 % 2 == 0).groupBy(_._1).toSeq.flatMap {
      case (q, hits) =>
        hits.sortBy(h => (h._3, h._2)).take(10).zipWithIndex
          .map { case ((_, v, d), i) => (q, i + 1L, v, d) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expect,
      "filtered search must equal exhaustive-search-then-filter")
    // pushdown: a range predicate must reach the parquet scan
    val p = Similarity.searchIvfPqIndexFiltered(spark, path, queries,
      col("vec_id") < 100).queryExecution.sparkPlan.toString
    assert(p.contains("PushedFilters") && p.contains("LessThan(vec_id,100)"),
      s"vec_id range must push into the codes scan:\n${p.take(2000)}")
  }

  test("index aging: planted-neighbor recall across drifted append+compact cycles, pinned; drift stats flag retrain") {
    // The centroid-drift regime: the index keeps ingesting appends whose
    // distribution has moved away from the training corpus, with NO
    // retrain. Each cycle appends pairs (a, b = a + 0.05·1⃗) shifted by
    // +2.0·cycle (idx_health's mid-strength drift unit); recall = fraction
    // of `a` queries whose top-10 contains the planted partner `b`.
    // Deterministic end to end (deterministic build, deterministic
    // shifts), so the measured numbers are pinned, not flaky floors.
    val dir = "/root/testdata/sf0.01"
    val path = java.nio.file.Files.createTempDirectory("graftaging").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val maxId = emb.agg(max(col("vec_id"))).first().getLong(0)
    def wMeanErr(df: org.apache.spark.sql.DataFrame): Double = df
      .agg((sum(col("mean_err") * col("n")) / sum(col("n"))).as("e"))
      .first().getDouble(0)
    val baseErr = wMeanErr(Similarity.indexDriftStats(spark, path, emb))
    val pairs = emb.filter(col("vec_id") % 10 === 0)
    val nq = pairs.count()
    val measured = Seq(0.0f, 0.25f, 0.5f, 1.0f, 2.0f).zipWithIndex.map { case (shift, c) =>
      val off = maxId + 1 + 20000L * (c + 1)
      def shifted(idOff: Long, eps: Float) = pairs.select(
        (col("vec_id") + idOff).as("vec_id"),
        transform(col("embedding"),
          x => (x + lit(shift) + lit(eps)).cast("float")).as("embedding"))
      val a = shifted(off, 0.0f)
      val b = shifted(off + 10000L, 0.05f)
      val delta = a.unionByName(b)
      // price the delta against the frozen sidecars BEFORE appending —
      // the number the rebuild decision would have seen at ingest time
      val errRatio = wMeanErr(Similarity.indexDriftStats(spark, path, delta)) / baseErr
      Similarity.appendToIvfPqIndex(spark, path, delta)
      Similarity.compactIvfPqIndex(spark, path)
      val hits = Similarity.searchIvfPqIndex(spark, path, a, k = 10)
        .filter(col("vec_id") === col("q_id") + 10000L).count()
      (hits.toDouble / nq, errRatio)
    }
    info(s"aging (recall, errRatio) per cycle: $measured")
    val (recalls, ratios) = (measured.map(_._1), measured.map(_._2))
    // pinned measurements (the sketch-recall convention — deterministic
    // numbers, not flaky floors): recall holds ≥0.9 through mild drift,
    // then collapses 0.92 → 0.24 → 0.00 as the shift grows
    assert(recalls == Seq(0.86, 0.94, 0.92, 0.24, 0.0), s"recalls: $recalls")
    // the tie to the rebuild rule: err_ratio is monotone in the drift and
    // crosses indexHealth's documented ~2× retrain threshold at cycle 1,
    // while recall is still ≥ 0.9 — the monitor fires BEFORE the damage;
    // an operator who ignores it through 50× has silently lost 3/4 of
    // planted-neighbor recall
    assert(ratios.sliding(2).forall(p => p(0) < p(1)), s"ratios: $ratios")
    assert(ratios(0) < 1.1, "undrifted appends price like the base corpus")
    assert(ratios(1) > 2.0 && recalls(1) >= 0.9,
      "the retrain threshold fires while the index is still healthy")
    assert(ratios(3) > 50 && recalls(3) <= 0.25,
      "ignoring the threshold through 50x costs most of the recall")
  }

  test("appendOrRetrain: in-distribution delta appends; drifted delta retrains; post-retrain pricing is healthy again") {
    val dir = "/root/testdata/sf0.01"
    val path = java.nio.file.Files.createTempDirectory("graftgate").toString
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val maxId = emb.agg(max(col("vec_id"))).first().getLong(0)
    val split = maxId / 2
    Similarity.writeIvfPqIndexFrom(spark, emb.filter(col("vec_id") < split), path)
    // same-distribution delta: prices ~1x -> appended, no rebuild
    val rest = emb.filter(col("vec_id") >= split)
    val (retrained1, r1) = Similarity.appendOrRetrain(spark, path, rest, emb)
    assert(!retrained1 && r1 < 2.0, s"in-distribution delta must append (ratio $r1)")
    assert(spark.read.parquet(s"$path/codes").count() == emb.count())
    // drifted delta: prices past the threshold -> full retrain in place
    def drift(idOff: Long) = emb.select((col("vec_id") + idOff).as("vec_id"),
      transform(col("embedding"), x => (x + lit(2.0f)).cast("float")).as("embedding"))
    val d1 = drift(maxId + 1)
    val all1 = emb.unionByName(d1)
    val (retrained2, r2) = Similarity.appendOrRetrain(spark, path, d1, all1)
    assert(retrained2 && r2 > 2.0, s"drifted delta must retrain (ratio $r2)")
    assert(spark.read.parquet(s"$path/codes").count() == all1.count(),
      "the retrain must cover base + delta")
    // the loop closes: a SECOND batch from the drifted mode now prices
    // against retrained codebooks that cover it -> appended, not retrained
    val d2 = drift(2 * (maxId + 1) + 1)
    val (retrained3, r3) = Similarity.appendOrRetrain(spark, path, d2, all1.unionByName(d2))
    assert(!retrained3 && r3 < 2.0,
      s"post-retrain, the drifted mode is in-distribution (ratio $r3)")
  }

  test("appendToIvfPqIndex: marker-file lock makes concurrent appends fail fast; lock released after use") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val split = emb.agg(max(col("vec_id"))).first().getLong(0) / 2
    val path = java.nio.file.Files.createTempDirectory("graftivflock").toString
    Similarity.writeIvfPqIndexFrom(spark, emb.filter(col("vec_id") < split), path)
    // a held lock (an in-flight append, or a hard-killed one) refuses the
    // second writer with the recovery path in the message
    val lock = java.nio.file.Paths.get(path, "_append.lock")
    java.nio.file.Files.createFile(lock)
    val ex = intercept[IllegalStateException](
      Similarity.appendToIvfPqIndex(spark, path, emb.filter(col("vec_id") >= split)))
    assert(ex.getMessage.contains("single-writer") &&
      ex.getMessage.contains("_append.lock"))
    java.nio.file.Files.delete(lock)
    // a successful append takes and RELEASES the lock
    Similarity.appendToIvfPqIndex(spark, path, emb.filter(col("vec_id") >= split))
    assert(!java.nio.file.Files.exists(lock))
    // and a failed append (overlapping delta) must release it too
    intercept[IllegalArgumentException](
      Similarity.appendToIvfPqIndex(spark, path, emb.limit(4)))
    assert(!java.nio.file.Files.exists(lock))
  }

  test("dd_semdedup_indexed: a stale index (missing corpus vectors) fails loudly") {
    // index built from half the corpus, swept against all of it: the inner
    // assignment join would silently drop the un-indexed half — the audit
    // must refuse instead and name the remedy
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val split = emb.agg(max(col("vec_id"))).first().getLong(0) / 2
    val path = java.nio.file.Files.createTempDirectory("graftsemstale").toString
    Similarity.writeIvfPqIndexFrom(spark, emb.filter(col("vec_id") < split), path)
    val ex = intercept[IllegalArgumentException](
      Dedup.dd_semdedup_indexed(spark, dir, path).collect())
    assert(ex.getMessage.contains("stale") && ex.getMessage.contains("appendToIvfPqIndex"))
  }

  test("dd_semdedup_indexed: persisted-quantizer cells flag bit-equal to inline; PQ codes pruned from the read") {
    // the index's coarse quantizer is the same deterministic one-step Lloyd
    // assignment dd_semdedup derives inline, so at nlist == k the cells —
    // and therefore every audit row — must match bit for bit
    val dir = "/root/testdata/sf0.01"
    val path = java.nio.file.Files.createTempDirectory("graftsemidx").toString
    Similarity.writeIvfPqIndex(spark, dir, path, nlist = 10)
    val fromIndex = Dedup.dd_semdedup_indexed(spark, dir, path)
    assert(fromIndex.collect().map(_.toSeq).toSeq ==
      Dedup.dd_semdedup(spark, dir).collect().map(_.toSeq).toSeq)
    // the assignment read wants (vec_id, cid) only — cid is the partition
    // value, so the codes FILE read must prune down to vec_id alone (the
    // operator checkpoints this frame, so assert on the read itself)
    val p = Dedup.indexAssignment(spark, path).queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<vec_id:bigint>"),
      s"assignment read must prune the PQ codes column:\n$p")
  }

  test("mm_semdedup: every planted embedding-space re-encode is caught (recall 1.0); zero organic flags; deterministic") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val nEmb = emb.count()
    val nPlants = emb.filter(col("vec_id") % 25 === 0).count()
    val audit = Multimodal.mm_semdedup(spark, dir).collect()
    val members = audit.map(_.getAs[Long]("n_members")).sum
    val dups = audit.map(_.getAs[Long]("n_dups")).sum
    // the asset frame = corpus + plants, none lost to the cell assignment
    assert(members == nEmb + nPlants)
    // recall 1.0 over the plants — the number mm_phash_reenc's dHash
    // banding can only promise at Hamming <= 3 (its spec pins the
    // empirical catch on THIS corpus; the embedding path catches a
    // re-encode by construction, cos >= 0.9999 vs a 0.51 organic max)...
    assert(dups >= nPlants, s"missed re-encodes: $dups < $nPlants")
    // ...and zero organic flags at the 0.9 threshold (empirical pin on the
    // shipped corpus: max organic cosine ~0.51)
    assert(dups == nPlants, s"organic pairs flagged: $dups > $nPlants")
    // the flagged member of each pair is the ORIGINAL (the plant's
    // mirrored id is lower, so it becomes the keeper) — every first_dup
    // is a non-negative corpus id
    assert(audit.filter(_.getAs[Long]("n_dups") > 0)
      .forall(r => r.getAs[Long]("first_dup") >= 0L))
    val again = Multimodal.mm_semdedup(spark, dir).collect()
    assert(audit.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mm_phash: a re-encoded payload escapes the exact digest but is caught perceptually") {
    // the planted re-encode: same content, a handful of byte substitutions
    // (codec/metadata drift stand-in) — md5 changes completely, the
    // gradient-sign fingerprint barely moves
    val base = "spark catalyst optimizer rewrites logical plans into physical plans " * 8
    val reenc = base.replaceAll("optimizer", "optimiser")
    val other = "zebras and quarks share no bytes with query engines at all " * 9
    val dir = tmpDocs(Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, reenc, "en", "s", reenc.length.toLong),
      (3L, other, "en", "s", other.length.toLong)))
    // exact digest: all three payloads are distinct — mm_dedup sees NO dup
    val exact = Multimodal.mm_dedup(spark, dir).collect()
    assert(exact.length == 3 && exact.forall(_.getLong(1) == 1L),
      "the planted re-encode must be invisible to exact digests")
    // perceptual: (1,2) surfaces, nothing pairs with the unrelated doc 3
    val pairs = Multimodal.mm_phash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
    assert(pairs.head._3 <= 10, s"re-encode should land within Hamming 10: ${pairs.head._3}")
    // byte-identical payloads ride the clique collapse: adding an exact
    // copy of doc 1 yields its pairs through member expansion at hamming 0
    val dir2 = tmpDocs(Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, reenc, "en", "s", reenc.length.toLong),
      (4L, base, "en", "s", base.length.toLong)))
    val withCopy = Multimodal.mm_phash(spark, dir2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(withCopy.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(withCopy.contains((1L, 4L, 0)), "byte-identical copy pairs at hamming 0")
    val h12 = withCopy.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(withCopy.contains((2L, 4L, h12)),
      "the member-expanded (2,4) pair must inherit the representative pair's hamming")
    // the façade form is SELF-verifying: one pair per planted re-encode,
    // (-(source+1), source) — mirrored plant ids can't collide with any
    // corpus id — nothing else, and deterministic
    val sfDir = "/root/testdata/sf0.001"
    val expected = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 25 === 0)
      .collect().map(r => (-(r.getLong(0) + 1), r.getLong(0))).toSet
    assert(expected.nonEmpty)
    val a = Multimodal.mm_phash_reenc(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = Multimodal.mm_phash_reenc(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.map(r => (r(0), r(1))).toSet == expected.map(p => (p._1: Any, p._2: Any)),
      s"façade pairs must be exactly the plants: got ${a.take(10)}")
    // expression edge: empty payload hashes to 0, null stays null
    val edge = Seq((Some(Array.emptyByteArray), 1), (None, 2))
      .toDF("payload", "id")
      .select(graft.functions.DHash64.of(col("payload")).as("h"))
      .collect()
    assert(edge.exists(r => !r.isNullAt(0) && r.getLong(0) == 0L))
    assert(edge.exists(_.isNullAt(0)))
  }

  test("band-bucket cap bounds hot buckets; exact-dup cliques survive any cap") {
    // 6 exact copies: identical signatures collapse to ONE representative,
    // so no band bucket is hot and every clique pair survives even a cap of 1
    val text = "spark catalyst optimizer rewrites logical plans into physical plans"
    val dir = tmpDocs((1L to 6L).map(i => (i, text, "en", "s", 1L)) :+
      ((7L, "totally unrelated words about zebras and quarks", "en", "s", 1L)))
    val atCap1 = Dedup.dd_minhash(spark, dir, maxBucket = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(atCap1.length == 15) // all C(6,2) pairs, via member expansion
    assert(atCap1.forall(_._3 == 1.0)) // identical sigs ⇒ est exactly 1.0
    // the cap itself: members of an over-limit (band, bkey) bucket are
    // excluded from candidate generation, and droppedBuckets reports it
    val banded = Seq(
      (0, 7L, 1L), (0, 7L, 2L), (0, 7L, 3L), // bucket of 3 distinct docs
      (1, 9L, 1L), (1, 9L, 4L))              // bucket of 2
      .toDF("band", "bkey", "doc_id").select("doc_id", "band", "bkey")
    assert(Dedup.capBuckets(banded, 2).count() == 2)
    val dropped = Dedup.droppedBuckets(banded, 2).collect()
    assert(dropped.length == 1 && dropped.head.getLong(2) == 3L)
  }

  test("capBuckets loss is always-on observable: observe() metric matches the droppedBuckets audit") {
    // planted overflow beside planted survivors: docs 1-5 are near-identical
    // variants (distinct signatures, shared band buckets of size ~5 — over a
    // cap of 2, dropped), docs 6-7 are a separate near-dup pair (buckets of
    // size 2 — survive and produce candidates, so the result is non-empty
    // and AQE cannot empty-propagate the branch carrying the metric node)
    val baseA = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val baseB = "winter summer autumn spring monday tuesday thursday friday " +
      "january march april june july september october december harvest sunrise"
    val dir = tmpDocs((1L to 5L).map(i => (i, s"$baseA tail$i", "en", "s", 1L)) ++
      Seq((6L, s"$baseB endingone", "en", "s", 1L), (7L, s"$baseB endingtwo", "en", "s", 1L),
        (9L, "unrelated zebra quark plasma lattice entirely different words", "en", "s", 1L)))
    val mh = Dedup.dd_minhash(spark, dir, maxBucket = 2)
    assert(mh.collect().nonEmpty, "surviving pair must keep the result non-empty")
    val got = Dedup.capBucketsLoss(mh, "dd_minhash").get
    // expected loss from the audit frame over the same pre-cap banding —
    // exact equality also proves the self-joined metric node doesn't
    // double-count
    val sigs = Dedup.minhashSignatures(
      graft.sources.Tables.loadParallel(spark, dir, "documents"), 32)
      .groupBy("sig").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("sig"))
    val preBanded = sigs
      .select(col("doc_id"), posexplode(graft.functions.TextFunctions.minhashBands(col("sig"), 32, 8)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
    val audit = Dedup.droppedBuckets(preBanded, 2)
      .agg(count(lit(1)), coalesce(sum(col("bucket_size")), lit(0L))).first()
    assert(audit.getLong(0) > 0, "planted overflow must actually overflow")
    assert(got == ((audit.getLong(0), audit.getLong(1))),
      s"observed loss $got != audit (${audit.getLong(0)}, ${audit.getLong(1)})")
    // and at a cap nothing exceeds, the metric reports zero loss
    val clean = Dedup.dd_minhash(spark, dir)
    clean.collect()
    assert(Dedup.capBucketsLoss(clean, "dd_minhash").get == ((0L, 0L)))
    // a frame that has NOT executed reports None (the metric node holds
    // null sums before any action), never an NPE
    assert(Dedup.capBucketsLoss(Dedup.dd_minhash(spark, dir), "dd_minhash").isEmpty)
    // composition: two differently-parameterized invocations union'd must
    // analyze (per-invocation metric names) and their losses sum
    val u = Dedup.dd_minhash(spark, dir, maxBucket = 2)
      .unionByName(Dedup.dd_minhash(spark, dir))
    u.collect()
    assert(Dedup.capBucketsLoss(u, "dd_minhash").get == got)
    // dd_simhash carries the same observation under its own name
    val sh = Dedup.dd_simhash(spark, dir, maxBucket = 2)
    sh.collect()
    val shm = Dedup.capBucketsLoss(sh, "dd_simhash").get
    assert(shm._1 > 0 && shm._2 > 2 * shm._1,
      s"five distinct fingerprints sharing bands must overflow a cap of 2: $shm")
  }

  test("SemDeDup forgone cross-cluster recall: >= 0.7 on near-identical dups; broad regime measured") {
    // SemDeDup's documented approximation forgoes near-dup pairs that
    // straddle cell boundaries. Within-cell pairs are a subset of all
    // pairs, so the flag set is a subset of the exact one and
    // recall = |sem| / |exact|. Two regimes, measured with the PRODUCTION
    // flag logic both times (exact = semdedupFlags with every vector in
    // one cell):
    import graft.functions.VecDot
    val dir = "/root/testdata/sf0.01"
    val raw = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
      .select("vec_id", "embedding")

    def recallAt(corpus: org.apache.spark.sql.DataFrame, t: Double): (Double, Int, Int) = {
      val cents = Clustering.initCentroids(corpus, 10)
      val base = corpus.select(col("vec_id"), col("embedding"),
        VecDot.norm(col("embedding")).as("nrm"))
      val e = base.withColumn("cluster", Clustering.assignTo(cents).getField("c"))
      val eAll = base.withColumn("cluster", lit(0))
      val sem = Dedup.semdedupFlags(e, t).select("b").collect().map(_.getLong(0)).toSet
      val exact = Dedup.semdedupFlags(eAll, t).select("b").collect().map(_.getLong(0)).toSet
      assert(sem.subsetOf(exact), "within-cell flags must be a subset of all-pairs flags")
      (if (exact.isEmpty) 1.0 else sem.size.toDouble / exact.size, sem.size, exact.size)
    }

    // (1) intended regime — near-identical duplicates (the paper's use
    // case, threshold ~0.9): plant a perturbed copy of every 5th vector
    // (cos ≈ 0.9999 to its source). A copy lands in its source's cell
    // unless the pair sits on a cell boundary, so recall must be high.
    val maxId = raw.agg(max(col("vec_id"))).first().getLong(0)
    val planted = raw.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + maxId + 1).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, (x * lit(1.001)).cast("float")).otherwise(x)).as("embedding"))
    val (rNear, semN, exactN) = recallAt(raw.unionByName(planted), 0.9)
    assert(exactN > 0, "planted perturbed copies must qualify at t=0.9")
    info(f"semdedup recall, planted near-identical t=0.9 k=10: $rNear%.3f ($semN/$exactN)")
    assert(rNear >= 0.7, f"cross-cluster loss too high in the intended regime: $rNear%.3f")

    // (2) broad-similarity regime on the raw corpus (t=0.4, the operator
    // default): qualifying pairs here are only loosely similar and
    // straddle cells freely — recall is LOW by design (measured 0.226;
    // README records it). SemDeDup is not a substitute for
    // dd_embed_cosine / dd_embed_lsh at low thresholds, and the spec pins
    // that documented reality rather than hiding it.
    val (rBroad, semB, exactB) = recallAt(raw, 0.4)
    info(f"semdedup recall, corpus broad regime t=0.4 k=10: $rBroad%.3f ($semB/$exactB)")
    assert(exactB > 0 && rBroad < 0.7, "broad-regime loss vanished — update README row")
  }

  test("semdedupFlags: exact-dup collapse expands back bit-equal to the all-pairs form") {
    // planted shapes that exercise every expansion branch: a 5-copy
    // bit-identical clique (intra flags), a scaled copy at cos exactly 1
    // in a DIFFERENT group (cross flags), a near pair, an unrelated
    // singleton, and a clique member with an id BELOW a qualifying other
    // group's rep (rep-flagged-by-cross case)
    import graft.functions.VecDot
    val base = Seq(1.0f, 2.0f, 3.0f, 4.0f)
    val near = Seq(1.0f, 2.0f, 3.0f, 4.5f)
    val scaled = base.map(_ * 2.0f)
    val far = Seq(-4.0f, 3.0f, -2.0f, 1.0f)
    val rows = Seq(10L, 11L, 12L, 13L, 14L).map(i => (i, base)) ++
      Seq((5L, scaled), (20L, near), (30L, far))
    val e = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        VecDot.norm(col("embedding")).as("nrm"),
        // one cell: the collapse/expansion logic is what's under test,
        // cell assignment is covered by the oracle + parity specs
        lit(0).as("cluster"))
    def flags(t: Double): Set[Long] =
      Dedup.semdedupFlags(e, t).select("b").collect().map(_.getLong(0)).toSet
    // brute-force reference: literal all-pairs a<b at the same expression
    def brute(t: Double): Set[Long] = {
      val a = e.select(col("cluster"), col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("cluster"), col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, Seq("cluster")).filter(col("a") < col("b"))
        .filter(VecDot.cosineFast(VecDot.dot(col("ea"), col("eb")), col("na"), col("nb")) >= t)
        .select("b").distinct().collect().map(_.getLong(0)).toSet
    }
    for (t <- Seq(0.9, 0.999999, 0.4)) assert(flags(t) == brute(t), s"t=$t")
    // the cos-1.0 cross-group copy must flag ids above its rep (5 < 10):
    // every clique member is cross-flagged even at a threshold where
    // nothing else qualifies
    assert(flags(0.999999) == Set(10L, 11L, 12L, 13L, 14L))
    // near pair qualifies at 0.9 (cos ≈ 0.997) but far singleton never does
    assert(flags(0.9).contains(20L) && !flags(0.4).contains(30L))
  }

  test("semdedupFlags: randomized corpora match the all-pairs form (seeded)") {
    // randomized sweep over the collapse/expansion algebra: small vector
    // pool so exact copies, scaled copies (cos 1 across groups), and near
    // pairs all occur, cells assigned ARBITRARILY (the collapse groups
    // per (cell, embedding), so parity must hold even when identical
    // vectors land in different cells), thresholds spanning negative to
    // 1.0. Zero vectors are excluded: cosine on them is a loud ANSI
    // divide-by-zero in BOTH forms (parity in failure, not a flag case).
    // Seeded for exact replay.
    import graft.functions.VecDot
    val rnd = new scala.util.Random(0x5EED5EED)
    for (round <- 1 to 5) {
      val pool = Vector.fill(5) {
        val v = Array.fill(4)((rnd.nextInt(9) - 4).toFloat)
        v(rnd.nextInt(4)) = (1 + rnd.nextInt(4)).toFloat // never the zero vector
        v
      }
      val n = 20 + rnd.nextInt(15)
      val rows = (0 until n).map { i =>
        val v = pool(rnd.nextInt(pool.size))
        val vec = rnd.nextInt(4) match {
          case 0 => v
          case 1 => v.map(_ * (1 + rnd.nextInt(3)).toFloat)
          case _ =>
            val p = v.map(x => x + (rnd.nextInt(3) - 1) * 0.5f)
            if (p.forall(_ == 0.0f)) v else p
        }
        (i.toLong, vec.toSeq, i % (1 + rnd.nextInt(3)))
      }
      val e = rows.toDF("vec_id", "embedding", "cluster")
        .select(col("vec_id"), col("embedding"),
          VecDot.norm(col("embedding")).as("nrm"), col("cluster"))
      val a = e.select(col("cluster"), col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("cluster"), col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
      for (t <- Seq(-0.5, 0.3, 0.9, 1.0)) {
        val brute = a.join(b, Seq("cluster")).filter(col("a") < col("b"))
          .filter(VecDot.cosineFast(VecDot.dot(col("ea"), col("eb")), col("na"), col("nb")) >= t)
          .select(col("cluster"), col("b")).distinct()
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
        val got = Dedup.semdedupFlags(e, t)
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
        assert(got == brute, s"round=$round t=$t corpus=${rows.take(8)}...")
      }
    }
  }

  test("graft.checkpoint.dir switches barriers to reliable checkpoints, results hash-equal") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val dir = tmpDocs(Seq((1L, s"$base one", "en", "s", 1L), (2L, s"$base two", "en", "s", 1L),
      (3L, "unrelated zebra quark plasma lattice entirely different words", "en", "s", 1L)))
    def run() = Dedup.dd_minhash(spark, dir).collect().map(_.toSeq).sortBy(_.toString)
    val local = run()
    assert(local.nonEmpty)
    val ckptDir = java.nio.file.Files.createTempDirectory("graftckpt")
    try {
      spark.conf.set(graft.Checkpoints.DirKey, ckptDir.toString)
      assert(run().toSeq == local.toSeq, "reliable-checkpoint run must be result-identical")
      // the barrier actually took the reliable path: rdd checkpoint files
      // landed under the configured directory (setCheckpointDir's UUID
      // subdir contains rdd-<id> dirs)
      val rddDirs = scala.jdk.CollectionConverters.IteratorHasAsScala(
        java.nio.file.Files.walk(ckptDir).iterator()).asScala
        .count(p => p.getFileName.toString.startsWith("rdd-"))
      assert(rddDirs > 0, s"no rdd-* checkpoint dirs under $ckptDir")
    } finally {
      spark.conf.unset(graft.Checkpoints.DirKey)
      org.apache.commons.io.FileUtils.deleteQuietly(ckptDir.toFile)
    }
    // and with the key unset the default local path still runs
    assert(run().toSeq == local.toSeq)
  }

  test("dd_cluster over representatives equals clustering the expanded pair graph") {
    val dir = "/root/testdata/sf0.01"
    val direct = Dedup.clusterPairs(Dedup.dd_minhash(spark, dir).select("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.dd_cluster(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == direct)
    // memo hit: cluster assignments are a per-snapshot artifact — the
    // second call hands back the SAME checkpointed frame
    assert(Dedup.dd_cluster(spark, dir) eq Dedup.dd_cluster(spark, dir))
  }

  test("prefix filtering is exact: dd_ngram_jaccard == naive all-pairs on random corpora") {
    // seeded corpora with heavy word overlap (worst case for candidate
    // explosion, best case for finding a dropped qualifying pair)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    for (trial <- 1 to 3) {
      val docs = (1L to 25L).map { id =>
        val n = 4 + rnd.nextInt(9)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "en", "s", 1L)
      }
      val dir = tmpDocs(docs)
      val got = Dedup.dd_ngram_jaccard(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // naive oracle: full distinct-shingle sets, all pairs, same arithmetic
      val naive = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), hashedShingles(col("text"), 3).as("shs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val expected = (for {
        a <- naive.keys; b <- naive.keys if a < b
        inter = (naive(a) & naive(b)).size
        j = inter.toDouble / (naive(a).size + naive(b).size - inter)
        if j >= 0.4
      } yield (a, b, j)).toSet
      assert(got == expected, s"trial $trial: prefix filter diverged from all-pairs")
    }
  }

  test("dd_containment is exact vs all-pairs; catches the subset-quote mode jaccard misses") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    for (trial <- 1 to 3) {
      val base = (1L to 20L).map { id =>
        val n = 4 + rnd.nextInt(9)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "en", "s", 1L)
      }
      // plant: doc 100 wholly quotes doc 1 inside 40 words of padding —
      // containment(1, 100) is exactly 1.0 while jaccard is tiny
      val host = (100L, base.head._2 + " " +
        Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "en", "s", 1L)
      val dir = tmpDocs(base :+ host)
      val got = Dedup.dd_containment(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val naive = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), hashedShingles(col("text"), 3).as("shs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val expected = (for {
        a <- naive.keys; b <- naive.keys if a < b
        inter = (naive(a) & naive(b)).size
        c = inter.toDouble / math.min(naive(a).size, naive(b).size)
        if c >= 0.8
      } yield (a, b, c)).toSet
      assert(got == expected, s"trial $trial: containment diverged from all-pairs")
      assert(got.contains((1L, 100L, 1.0)), s"trial $trial: planted quote pair missing")
      if (trial == 1) {
        // the same planted pair is invisible to symmetric jaccard dedup
        val jac = Dedup.dd_ngram_jaccard(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(!jac.contains((1L, 100L)), "quote pair should be below the jaccard threshold")
      }
    }
  }

  test("ppjoin epsilon boundaries: pairs at EXACTLY the threshold survive every pruning guard") {
    // The deterministic twin of tools/check_ppjoin_adversarial.py: random
    // corpora (above) almost never land a pair AT the guard boundaries,
    // so the three epsilon-guarded comparisons are otherwise certified
    // only by shipped-corpus hashes. Each plant sits exactly where an
    // IEEE over-ceiling regression (the round-10 bug class) flips:
    //  - (100,101): J = 22/55 = 0.4 exactly, a 24-word verbatim quote of
    //    a 57-word doc. The single candidate match has positional bound
    //    ub = 22 vs requirement 77*(0.4/1.4) = 22.000000000000004 —
    //    dropping the 1e-9 epsilon prunes this true pair. Its min common
    //    shingle also sits in the LAST probe-prefix slot (rank 33 of 34)
    //    and the length filter holds with equality (22 >= 55*0.4).
    //  - (200,201): J = 12/30 = 0.4 exactly; the index prefix computes
    //    over 21*(2*0.4/1.4) = 12.000000000000002 — without the epsilon
    //    the prefix shrinks 10 -> 9 and excludes the only shared token.
    //  - (300,301): containment = 44/55 = 0.8 exactly with the smaller
    //    side's min common shingle at the last prefix slot (rank 11 of
    //    12) — any one-shorter prefix drops it.
    //  - (400,401)/(500,501): just-below-threshold controls (11/31 and
    //    43/55) that must stay excluded from their operator.
    // (The python tool proves the engagement claims by replaying the
    // pruning pipeline with and without the epsilons.)
    def words(p: String, n: Int) = (0 until n).map(i => s"$p$i")
    val a1 = words("p1w", 57)
    val sh2 = words("p2s", 14)
    val sh3 = words("p3s", 46)
    val sh4 = words("p4s", 13)
    val sh5 = words("p5s", 45)
    def doc(id: Long, ws: Seq[String]) = (id, ws.mkString(" "), "en", "s", 1L)
    val dir = tmpDocs(Seq(
      doc(100L, a1), doc(101L, a1.slice(33, 57)),
      doc(200L, words("p2a", 9) ++ sh2), doc(201L, words("p2b", 9) ++ sh2),
      doc(300L, words("p3a", 11) ++ sh3), doc(301L, words("p3b", 16) ++ sh3),
      doc(400L, words("p4a", 10) ++ sh4), doc(401L, words("p4b", 10) ++ sh4),
      doc(500L, words("p5a", 12) ++ sh5), doc(501L, words("p5b", 17) ++ sh5)))
    val jac = Dedup.dd_ngram_jaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(jac == Set(
      (100L, 101L, 22.0 / 55), (200L, 201L, 12.0 / 30),
      (300L, 301L, 44.0 / 71), (500L, 501L, 43.0 / 72)),
      "a boundary pair was pruned (or a below-threshold control leaked)")
    val cont = Dedup.dd_containment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cont == Set(
      (100L, 101L, 1.0), (300L, 301L, 44.0 / 55)),
      "the exactly-at-threshold containment pair was pruned " +
        "(or the 43/55 control leaked)")
  }

  test("decon_embed: scala all-pairs argmax reproduced exactly; planted paraphrase flagged") {
    val d = 16
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(d)(r.nextFloat() - 0.5f)
    }
    val evals = (0L until 64L).map(i => (i, vec(i.toInt), "e"))
    // train 200 = eval 3 rescaled (same direction — a "paraphrase");
    // train 300 unrelated
    val rows = evals ++ Seq(
      (200L, vec(3).map(x => x * 1.01f), "t"),
      (300L, vec(999), "t"))
    val dir = tmpEmb(rows)
    val got = Curation.decon_embed(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // naive oracle in VecDot's exact arithmetic (index-order double sums)
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.size) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val trains = rows.filter(_._1 >= 64L)
    assert(got.keySet == trains.map(_._1).toSet)
    trains.foreach { case (vid, v, _) =>
      val (bc, bne) = evals.map { case (e, ev, _) => (cos(v, ev), -e) }.max
      val (gotEval, gotCos, gotFlag) = got(vid)
      assert(gotEval == -bne && gotCos == bc && gotFlag == (bc >= 0.8),
        s"vec $vid: got $gotEval/$gotCos/$gotFlag want ${-bne}/$bc")
    }
    assert(got(200L)._1 == 3L && got(200L)._3, "planted paraphrase must flag eval 3")
    assert(got(200L)._2 > 0.999)
  }

  test("decon_embed: a zero-norm eval vector cannot poison the corpus; a zero-norm train vector scores -1") {
    // cos against a zero vector is NaN, and NaN sorts greatest in struct
    // max on BOTH engines — without the guards one empty benchmark
    // question flags every training vector contaminated (hash-matched,
    // because the oracle sorts NaN identically)
    val d = 8
    val unit: Seq[Float] = 1.0f +: Seq.fill(d - 1)(0.0f)
    val zero: Seq[Float] = Seq.fill(d)(0.0f)
    val rows = Seq(
      (0L, zero, "e"),            // degenerate eval — must be dropped
      (1L, unit, "e"),            // real eval
      (100L, unit.map(_ * 2f), "t"),  // aligned with eval 1 -> cos 1.0
      (200L, zero, "t"))          // degenerate train -> cos -1, not NaN
    val dir = tmpEmb(rows)
    val got = Curation.decon_embed(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(100L) == ((1L, 1.0, true)), "real pair unaffected by the zero eval")
    assert(got(200L)._2 == -1.0 && !got(200L)._3, "zero-norm train scores -1, never NaN")
    assert(!got.values.exists(v => v._2.isNaN), "no NaN escapes the operator")
  }

  test("ev_reach/ev_dwell/q56_mode: hand-computed on a planted sequence") {
    // the DuckDB twins MIRROR these rewrites, so a shared semantic error
    // would pass the hash gate — these expectations are computed by hand
    val dir = java.nio.file.Files.createTempDirectory("graftev").toString
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // u1: day1 A->B->A, day2 one A (a day with events but ZERO first-time
    // users — the reach curve must emit it flat, not skip it); u2: day3 A
    Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 1L, "A", 1.0, "{}"),
      (2L, ts("2024-01-01T00:00:10Z"), 1L, "B", 1.0, "{}"),
      (3L, ts("2024-01-01T00:00:40Z"), 1L, "A", 1.0, "{}"),
      (4L, ts("2024-01-02T00:00:00Z"), 1L, "A", 1.0, "{}"),
      (5L, ts("2024-01-03T00:00:00Z"), 2L, "A", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // edge probes for the round-13 additions, same fixture conventions:
    // ev_ewma on an empty events table returns empty, no errors
    val emptyDir = java.nio.file.Files.createTempDirectory("graftevempty").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$emptyDir/events.parquet")
    assert(graft.operators.Relational.ev_ewma(spark, emptyDir).count() == 0)
    val reach = graft.operators.Relational.ev_reach(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(reach == Seq(
      ("A", "2024-01-01", 1L, 1L),
      ("A", "2024-01-02", 0L, 1L), // the zero-new day rides the curve
      ("A", "2024-01-03", 1L, 2L),
      ("B", "2024-01-01", 1L, 1L)))
    val dwell = graft.operators.Relational.ev_dwell(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(dwell == Seq(
      ("A", "A", 1L, 86360000000L, 86360000000L), // day1 00:00:40 -> day2 00:00:00
      ("A", "B", 1L, 10000000L, 10000000L),
      ("B", "A", 1L, 30000000L, 30000000L)))
    val mode = graft.operators.Relational.q56_mode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(mode == Seq((1L, "A", 3L, 2L), (2L, "A", 1L, 1L)))
  }

  test("ev_paths: first-k prefix paths hand-computed; k bounds the per-user sequence") {
    val dir = java.nio.file.Files.createTempDirectory("graftpaths").toString
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // u1: A,B,A; u2: A alone; u3: A,B,A,C (4th event must NOT extend the path)
    Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 1L, "A", 1.0, "{}"),
      (2L, ts("2024-01-01T00:00:10Z"), 1L, "B", 1.0, "{}"),
      (3L, ts("2024-01-01T00:00:20Z"), 1L, "A", 1.0, "{}"),
      (4L, ts("2024-01-01T00:00:00Z"), 2L, "A", 1.0, "{}"),
      (5L, ts("2024-01-02T00:00:00Z"), 3L, "A", 1.0, "{}"),
      (6L, ts("2024-01-02T00:00:10Z"), 3L, "B", 1.0, "{}"),
      (7L, ts("2024-01-02T00:00:20Z"), 3L, "A", 1.0, "{}"),
      (8L, ts("2024-01-02T00:00:30Z"), 3L, "C", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.operators.Relational.ev_paths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("A > B > A", 2L), ("A", 1L)))
  }

  test("ev_coverage: overlapping intervals union, disjoint ones split, hand-computed micros") {
    val dir = java.nio.file.Files.createTempDirectory("graftcov").toString
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // u1: [00:00, 00:02) and [00:01, 00:03) overlap -> one 3-min island;
    //     [00:10, 00:11) is its own island
    // u2: one interval -> one island of exactly value minutes
    Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 1L, "view", 2.0, "{}"),
      (2L, ts("2024-01-01T00:01:00Z"), 1L, "view", 2.0, "{}"),
      (3L, ts("2024-01-01T00:10:00Z"), 1L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01T00:00:00Z"), 2L, "view", 5.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.operators.Relational.ev_coverage(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val min = 60000000L
    assert(got(1L) == ((2L, 4L * min, 3L * min)))
    assert(got(2L) == ((1L, (5.5 * min).toLong, (5.5 * min).toLong)))
  }

  test("decon_url: flags exactly the training docs whose URL class collides with the eval slice") {
    val dir = "/root/testdata/sf0.001"
    val rows = Curation.decon_url(spark, dir).collect()
    assert(rows.nonEmpty, "the screen must not be structurally vacuous")
    rows.foreach { r =>
      assert(r.getLong(0) % 3 != 0, "flagged docs are training-side")
      assert(r.getLong(2) % 3 == 0, "the reported match is an eval doc")
    }
    // independent recomputation: after the www-strip the seven hosts stay
    // distinct, so a normalized URL class is (id%7, id%20) = id mod 140
    val n = 500
    val evalClasses = (0 until n).filter(_ % 3 == 0).map(_ % 140).toSet
    val expected = (0 until n)
      .filter(i => i % 3 != 0 && evalClasses(i % 140)).map(_.toLong).toSet
    assert(rows.map(_.getLong(0)).toSet == expected)
  }

  test("decon_bm25: distinctive-term retrieval ranks the term-stuffed short doc first; df=0 terms retrieve nothing; bad configs refuse") {
    val common = Seq.fill(6)("common").mkString(" ")
    val dir = tmpDocs(Seq(
      // eval slice: doc 0 carries two rare terms + one ubiquitous one;
      // doc 90 carries ONLY a term absent from training (df = 0)
      (0L, "alpha beta common", "en", "src0", 17L),
      (90L, "ghost ghost", "en", "src0", 11L),
      // train: 1 = short + both rare terms; 3 = one rare term diluted in
      // a long doc; 2 = only the ubiquitous term; 4.. = common filler
      (1L, "alpha alpha beta", "en", "src1", 16L),
      (2L, common, "en", "src1", common.length.toLong),
      (3L, ("alpha " + Seq.fill(19)("pad").mkString(" ")), "en", "src1", 81L),
      (4L, s"$common pad", "en", "src2", common.length + 4L),
      (5L, s"$common pad", "en", "src2", common.length + 4L)))
    val rows = Curation.decon_bm25(spark, dir).collect()
    // eval 90's only term never occurs in training — retrieval is empty
    // for it, not an error and not a full-corpus flag
    assert(!rows.exists(_.getLong(0) == 90L),
      "a df=0-only eval doc must retrieve nothing")
    val e0 = rows.filter(_.getLong(0) == 0L).sortBy(_.getLong(5))
    assert(e0.nonEmpty && e0.map(_.getLong(5)).toSeq == (1L to e0.length),
      "ranks must be dense 1..n per eval doc")
    // the short doc carrying BOTH rare query terms outranks everything;
    // the diluted long doc still beats the common-only one
    assert(e0.head.getLong(1) == 1L, s"expected doc 1 at rank 1, got ${e0.head}")
    assert(e0.head.getLong(3) >= 2L, "rank-1 doc matches both rare terms")
    // every train doc hits some query term, so k=5 retrieves all five
    val pos = e0.map(_.getLong(1)).toSeq
    assert(pos.toSet == Set(1L, 2L, 3L, 4L, 5L), s"expected all five train docs, got $pos")
    // docs 4 and 5 are verbatim twins (same tf, same dl) — identical
    // scores, tie broken deterministically by doc_id
    val s4 = e0.find(_.getLong(1) == 4L).get.getLong(4)
    val s5 = e0.find(_.getLong(1) == 5L).get.getLong(4)
    assert(s4 == s5 && pos.indexOf(4L) == pos.indexOf(5L) - 1,
      s"twin docs must tie on score and break by doc_id, got $pos")
    assert(e0.map(_.getLong(4)).toSeq == e0.map(_.getLong(4)).toSeq.sorted.reverse)
    assert(intercept[IllegalArgumentException] {
      Curation.decon_bm25(spark, dir, m = 0)
    }.getMessage.contains("m=0"))
    assert(intercept[IllegalArgumentException] {
      Curation.decon_bm25(spark, dir, k = 0)
    }.getMessage.contains("k=0"))
    assert(intercept[IllegalArgumentException] {
      Curation.decon_bm25(spark, tmpDocs(Seq(
        (0L, "alpha", "en", "src0", 5L))))
    }.getMessage.contains("no training documents"))
  }

  test("decon_bm25: the top-m query tie at the m-th slot resolves to the lexically smaller term (check_bm25_adversarial B4 twin)") {
    // slots at m=2: "qq" (df=1) takes slot 1; "tiea"/"tieb" (df=2 each,
    // EQUAL idf) tie at slot 2 — the lex tie-break decides which term
    // retrieves, and the two candidates match DISJOINT train docs, so a
    // broken tie-break changes the emitted set, not just its order
    val dir = tmpDocs(Seq(
      (0L, "qq tiea tieb", "en", "src0", 12L),
      (1L, "qq pad", "en", "src1", 6L),
      (2L, "tiea xx", "en", "src1", 7L),
      (3L, "tiea yy", "en", "src1", 7L),
      (4L, "tieb zz", "en", "src1", 7L),
      (5L, "tieb ww", "en", "src1", 7L)))
    val got = Curation.decon_bm25(spark, dir, m = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L),
      s"query must be {qq, tiea} (tiea < tieb at the tied slot), got docs $got")
  }

  test("ev_attribution: last preceding non-purchase touch gets the cents; untouched purchases credit (none)") {
    val dir = java.nio.file.Files.createTempDirectory("graftattr").toString
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    Seq(
      // u1: view, click, purchase 3.50, purchase 1.25 — BOTH purchases
      // credit the click (a purchase is never a channel)
      (1L, ts("2024-01-01T00:00:00Z"), 1L, "view", 1.00, "{}"),
      (2L, ts("2024-01-01T00:00:10Z"), 1L, "click", 2.00, "{}"),
      (3L, ts("2024-01-01T00:00:20Z"), 1L, "purchase", 3.50, "{}"),
      (4L, ts("2024-01-01T00:00:30Z"), 1L, "purchase", 1.25, "{}"),
      // u2: cold purchase — no prior touch
      (5L, ts("2024-01-01T00:00:00Z"), 2L, "purchase", 9.99, "{}"),
      // u3: signup then a one-cent purchase
      (6L, ts("2024-01-01T00:00:00Z"), 3L, "signup", 1.0, "{}"),
      (7L, ts("2024-01-01T00:00:10Z"), 3L, "purchase", 0.01, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.operators.Relational.ev_attribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("(none)", 1L, 999L), ("click", 2L, 475L), ("signup", 1L, 1L)))
  }

  test("embed_rp: integer projections deterministic, bounded, and distance-structure-preserving") {
    val dir = "/root/testdata/sf0.001"
    val a = Clustering.embed_rp(spark, dir).collect()
    val b = Clustering.embed_rp(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "bit-identical across runs")
    // every coordinate is an exact bounded integer: |code| <= 127 over 64 dims
    val bound = 127L * 64L
    assert(a.forall(r => (1 to 8).forall(i => math.abs(r.getLong(i)) <= bound)))
    // the sign matrix is deterministic and rows are distinct (no collapsed
    // output dimension)
    val signs = Clustering.rpSigns(8, 64)
    assert(signs == Clustering.rpSigns(8, 64))
    assert(signs.distinct.size == 8)
    // structure preservation, two regimes (the sketch-recall device):
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map(p => p._1 * p._2).sum
      val nx = math.sqrt(x.map(v => v * v).sum); val ny = math.sqrt(y.map(v => v * v).sum)
      if (nx == 0 || ny == 0) -1.0 else d / (nx * ny)
    }
    def topK(q: Long, space: Map[Long, Array[Double]], k: Int): Seq[Long] =
      space.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (-cos(space(q), v), id) }.take(k).map(_._1)
    // (1) STRONG similarity survives: planted near-copies are RP-space
    // top-1 — the regime the operator is for (near-dup candidates).
    val rnd = new scala.util.Random(11)
    val base = (0L until 60L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2f - 1f), "b"))
    val copies = base.take(10).map { case (i, v, _) =>
      (i + 1000L, v.updated(0, v.head + 0.01f), "c") }
    val planted = Clustering.embed_rp(spark, tmpEmb(base ++ copies)).collect()
      .map(r => (r.getLong(0), (1 to 8).map(r.getLong).map(_.toDouble).toArray)).toMap
    copies.foreach { case (cid, _, _) =>
      assert(topK(cid, planted, 1) == Seq(cid - 1000L),
        s"planted near-copy $cid must rank its base top-1 in RP space")
    }
    // (2) NOISE-regime candidate generation, measured and pinned: on the
    // synthetic corpus (near-uniform vectors — the hardest case, neighbors
    // barely separated from bulk) the exact top-10 lands in the RP top-100
    // at a measured 0.489 mean; the floor documents that 64->8 signed dims
    // is a coarse candidate generator there, NOT a final ranking.
    val exact = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val rp = a.map(r => (r.getLong(0), (1 to 8).map(r.getLong).map(_.toDouble).toArray)).toMap
    val recalls = exact.keys.toSeq.sorted.take(50).map { q =>
      val e = topK(q, exact, 10).toSet
      (e & topK(q, rp, 100).toSet).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.4, s"mean RP top-10-in-top-100 recall $mean below the pinned floor 0.4")
  }

  test("ann_sq: code-cosine recall >= 0.9 vs float bruteforce; ranks dense, self excluded") {
    val dir = "/root/testdata/sf0.01"
    val bf = Similarity.ann_bruteforce(spark, dir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.ann_sq(spark, dir).collect()
    val sq = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf & sq).size.toDouble / bf.size
    assert(recall >= 0.9, s"SQ8 code-cosine recall $recall < 0.9")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length))
      assert(byRank.forall(_.getLong(2) != q))
    }
  }

  test("dedup/text operators return empty results on an empty corpus, no errors") {
    val dir = tmpDocs(Seq.empty)
    assert(Dedup.dd_exact(spark, dir).count() == 0)
    assert(Dedup.dd_minhash(spark, dir).count() == 0)
    assert(Dedup.dd_simhash(spark, dir).count() == 0)
    assert(Dedup.dd_ngram_jaccard(spark, dir).count() == 0)
    assert(Dedup.dd_cluster(spark, dir).count() == 0)
    assert(TextAnalysis.tx_fingerprint(spark, dir).count() == 0)
    assert(TextAnalysis.tx_langid(spark, dir).count() == 0)
    assert(TextAnalysis.tx_langid2(spark, dir).count() == 0)
    assert(Curation.dd_para(spark, dir).count() == 0)
    assert(Curation.samp_stratified(spark, dir).count() == 0)
    assert(Curation.samp_reservoir(spark, dir).count() == 0)
    assert(Curation.samp_split(spark, dir).count() == 0)
    assert(Curation.decon_ngram(spark, dir).count() == 0)
    assert(TextAnalysis.tx_gopher(spark, dir).count() == 0)
    assert(TextAnalysis.tx_norm(spark, dir).count() == 0)
    assert(TextAnalysis.tx_repetition(spark, dir).count() == 0)
    assert(TextAnalysis.tx_entropy(spark, dir).count() == 0)
    assert(TextAnalysis.tx_readability(spark, dir).count() == 0)
    assert(Curation.samp_importance(spark, dir).count() == 0)
    val census = Curation.profile_table(spark, dir).collect() // 5 cols of true zeros
    assert(census.length == 5 &&
      census.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("ev_hll: HLL estimates within 5% of exact count-distinct per group") {
    val dir = "/root/testdata/sf0.01"
    val exact = graft.operators.Relational.q27_count_distinct(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = graft.operators.Relational.ev_hll(spark, dir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (eParts, eSupps) = exact(r.getString(0))
      assert(math.abs(r.getLong(1) - eParts).toDouble / eParts < 0.05,
        s"n_parts ${r.getLong(1)} vs exact $eParts")
      assert(math.abs(r.getLong(2) - eSupps).toDouble / eSupps < 0.05,
        s"n_supps ${r.getLong(2)} vs exact $eSupps")
    }
  }

  test("ev_quantile: GK approx percentiles within 0.5% rank error of exact per group") {
    val dir = "/root/testdata/sf0.01"
    val events = graft.sources.Tables.load(spark, dir, "events")
    val approx = graft.operators.Relational.ev_quantile(spark, dir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val tpe = r.getString(0)
      val vals = events.filter(col("event_type") === tpe)
        .select("value").as[Double].collect().sorted
      for ((p, i) <- Seq(0.5, 0.95, 0.99).zipWithIndex) {
        val est = r.getDouble(i + 1)
        // rank of the estimate in the exact sorted values must be within
        // 0.5% of the requested rank (GK guarantees 1/accuracy = 0.1%)
        val rank = vals.count(_ <= est).toDouble / vals.length
        assert(math.abs(rank - p) <= 0.005 || est == vals.last,
          s"$tpe p$p: estimate $est sits at rank $rank")
      }
    }
  }

  test("q30_percentile scale guard: exact percentile is distinct-value-bounded per group (hot skewed group stays exact), and the documented approx_percentile swap tracks it within rank tolerance") {
    // Part 1 — the per-group buffering bound. Spark's exact `percentile`
    // aggregates a value→count map, so per-group state is O(distinct
    // values), NOT O(rows): a hot group in the l_quantity regime (50
    // distinct integer quantities) stays exact and cheap at any row count.
    // The 100 TB hazard q30's scaladoc prices is the CONTINUOUS column
    // (l_extendedprice — distinct ≈ rows, so the map degenerates to
    // row-scale state on a hot group); the documented production swap is
    // approx_percentile, kept OUT of the declared query so every emitted
    // column stays oracle-exact.
    val hotN = 200000L
    val hot = spark.range(hotN)
      .select(lit("H").as("g"), ((col("id") % 50) + 1).cast("double").as("v"))
    val cold = spark.range(100L)
      .select(lit("C").as("g"), ((col("id") % 7) + 1).cast("double").as("v"))
    val got = hot.unionAll(cold).groupBy("g")
      .agg(percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def exactRef(vals: IndexedSeq[Double], p: Double): Double = {
      val pos = p * (vals.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < vals.length) vals(lo) * (1 - frac) + vals(lo + 1) * frac
      else vals(lo)
    }
    // values are (id % distinct) + 1, each appearing n/distinct times
    val hotVals = (0L until hotN).map(i => (i % 50 + 1).toDouble).sorted
    val coldVals = (0L until 100L).map(i => (i % 7 + 1).toDouble).sorted
    assert(got("H")._1 == exactRef(hotVals, 0.5) &&
      got("H")._2 == exactRef(hotVals, 0.95),
      s"hot-group exact percentile drifted: ${got("H")}")
    assert(got("C")._1 == exactRef(coldVals, 0.5) &&
      got("C")._2 == exactRef(coldVals, 0.95))
    // Part 2 — the documented swap: approx_percentile over the same
    // lineitem groups sits within 0.5% rank of q30's exact values (GK at
    // accuracy=1000 guarantees 0.1%), so the scale variant is a drop-in.
    val dir = "/root/testdata/sf0.01"
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val exactQ = graft.operators.Relational.q30_percentile(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approxQ = li.groupBy("l_returnflag")
      .agg(approx_percentile(col("l_quantity"),
        array(lit(0.5), lit(0.95)), lit(1000)).as("pa"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1)(0), r.getSeq[Double](1)(1))).toMap
    assert(approxQ.keySet == exactQ.keySet && approxQ.nonEmpty)
    approxQ.foreach { case (g, (a50, a95)) =>
      val qs = li.filter(col("l_returnflag") === g)
        .select(col("l_quantity").cast("double")).as[Double].collect().sorted
      // l_quantity is DISCRETE (50 integer values), so a returned value's
      // rank is an INTERVAL [P(v < est), P(v <= est)] — with heavy ties the
      // estimate at the requested rank spans several percent of positions.
      // GK's guarantee is that the requested rank falls inside that
      // interval (± the 1/accuracy rank error), not that the upper count
      // sits near it.
      def rankOk(v: Double, p: Double): Boolean = {
        val lo = qs.count(_ < v).toDouble / qs.length
        val hi = qs.count(_ <= v).toDouble / qs.length
        p >= lo - 0.005 && p <= hi + 0.005
      }
      assert(rankOk(a50, 0.5),
        s"$g p50 approx $a50 outside its rank interval (exact ${exactQ(g)._1})")
      assert(rankOk(a95, 0.95),
        s"$g p95 approx $a95 outside its rank interval (exact ${exactQ(g)._2})")
    }
  }

  test("RewriteSortedOverlap rewrites the provable composed shape — and ONLY that shape") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.functions.RewriteSortedOverlap
    try {
      // x/y have duplicates: the distinct-then-sort branch may rewrite (the
      // merge count is then exact); the sort-only branch must NOT (a merge
      // over duplicates would count 2 where array_intersect's set answer is 1)
      // arrays derive from the range column so constant folding can't
      // pre-collapse the whole expression into a LocalRelation
      val df = spark.range(1)
        .select(array(col("id") + 2L, lit(2L)).as("x"),
          array(col("id") + 2L, lit(2L)).as("y"))
        .select(
          size(array_intersect(array_sort(array_distinct(col("x"))),
            array_sort(array_distinct(col("y"))))).as("proven"),
          size(array_intersect(array_sort(col("x")), array_sort(col("y")))).as("unproven"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("sorted_overlap_count"), s"expected rewrite in:\n$opt")
      assert(opt.contains("array_intersect"), s"sort-only shape must survive:\n$opt")
      val row = df.collect().head
      assert(row.getInt(0) == 1 && row.getInt(1) == 1)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("SortedOverlapCount == size(array_intersect) on sorted distinct arrays; null-safe") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val a = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      (i, a, b)
    } ++ Seq((201, Seq.empty[Long], Seq(1L, 2L)), (202, Seq(3L), Seq.empty[Long]))
    val df = rows.toDF("id", "a", "b")
    val mismatches = df.select(
        graft.functions.SortedOverlap.count(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
    // null input -> null out (nullIntolerant); when(false, a) keeps the
    // non-null-element array type the expression's type check requires
    val nulls = df.limit(1)
      .select(graft.functions.SortedOverlap.count(when(lit(false), col("a")), col("b")))
      .collect()
    assert(nulls.head.isNullAt(0))
    // nullable-element or non-long arrays must fail analysis, not misread bytes
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.SortedOverlap.count(
        lit(null).cast("array<bigint>"), col("b"))).collect()
    }
  }

  test("q49_scd2: consecutive repeats collapse; intervals chain; last period is current") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val dir = tmpEvents(Seq(
      (1L, ts(0), 10L, "A", 1.0, "{}"),
      (2L, ts(1), 10L, "A", 1.0, "{}"), // repeat — same period as event 1
      (3L, ts(2), 10L, "B", 1.0, "{}"),
      (4L, ts(3), 10L, "A", 1.0, "{}"), // back to A — a NEW period, not merged
      (5L, ts(0), 20L, "C", 1.0, "{}")))
    val out = Relational.q49_scd2(spark, dir).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (10L, "A", ts(0), Some(ts(2)), false, 2L),
      (10L, "B", ts(2), Some(ts(3)), false, 1L),
      (10L, "A", ts(3), None, true, 1L),
      (20L, "C", ts(0), None, true, 1L)))
  }

  test("q49_scd2: same-instant state flips order by island index — output order total and deterministic") {
    // three events at ONE instant, states A,B,A: (user_id, valid_from) is
    // not a total order here — even with state as tiebreaker the two A
    // periods collide — so the final sort must ride the island index
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val dir = tmpEvents(Seq(
      (1L, ts0, 10L, "A", 1.0, "{}"),
      (2L, ts0, 10L, "B", 1.0, "{}"),
      (3L, ts0, 10L, "A", 1.0, "{}")))
    val out = Relational.q49_scd2(spark, dir).collect().map(r =>
      (r.getString(1), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("A", Some(ts0), false), ("B", Some(ts0), false), ("A", None, true)))
  }

  test("q26_asof_join: a same-instant view is NOT prior — strictly earlier in TIME, matching the oracle's ASOF predicate") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val dir = tmpEvents(Seq(
      (1L, ts(0), 10L, "view", 1.0, "{}"),
      (2L, ts(0), 10L, "purchase", 1.0, "{}"), // same instant: NO prior view
      (3L, ts(1), 10L, "purchase", 1.0, "{}"), // strictly later: view at ts0
      (4L, ts(2), 20L, "purchase", 1.0, "{}"))) // user with no views
    val out = Relational.q26_asof_join(spark, dir).collect()
      .map(r => r.getLong(1) -> Option(r.getTimestamp(3))).toMap
    assert(out(2L).isEmpty) // a ROW frame ordered by (ts,event_id) would leak ts0 here
    assert(out(3L).contains(ts(0)))
    assert(out(4L).isEmpty)
  }

  test("dd_incremental_stored: null-text delta rows ride the Bloom screen's negative branch (no NPE; screen output-invariant)") {
    val t2 = "spark catalyst optimizer rewrites logical plans into physical plans"
    val dir = tmpDocs(Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "s", 1L),
      (2L, t2, "en", "s", 1L),
      (4L, null, "en", "s", 1L), // delta row (residue 4) with NULL text
      (9L, t2, "en", "s", 1L))) // delta exact dup of base doc 2
    val store = java.nio.file.Files.createTempDirectory("graftsignull").toString
    Dedup.writeCorpusSignatures(spark, dir, store)
    val on = Dedup.dd_incremental_stored(spark, dir, store).collect().toSeq
    val off = Dedup.dd_incremental_stored(spark, dir, store, useBloom = false)
      .collect().toSeq
    assert(on == off) // the documented contract: screen on/off identical
    assert(on.exists(r => r.getLong(0) == 9L && r.getString(1) == "exact_dup"))
  }

  test("dd_incremental_stored: epsilon-boundary near-dup at J=55/100 with t=0.55 survives the guarded pruning (the check_incremental_adversarial twin)") {
    // 100*0.55 = 55.00000000000001 in IEEE doubles: an unguarded ceil
    // shrinks the delta prefix from 46 to 45 (absent-shingles-only) AND
    // the length filter 55 >= 55.00000000000001 rejects the base doc —
    // either regression silently drops this true near-dup. The 45
    // absent-from-base shingles (df 0) rank before every shared one
    // (df 1), so the first shared shingle sits at the LAST guarded
    // prefix slot. Deterministic in-suite twin of the gate's epsilon
    // plant (tools/check_incremental_adversarial.py carries the Bloom
    // false-positive half, which needs thousands of probes).
    val shared = (0 until 57).map(j => s"t55s$j")
    val dir = tmpDocs(Seq(
      (0L, shared.mkString(" "), "en", "s", 1L), // base: 55 shingles
      (4L, ((0 until 45).map(j => s"t55a$j") ++ shared).mkString(" "),
        "en", "s", 1L))) // delta: 100 shingles, 55 shared -> J = 0.55
    val store = java.nio.file.Files.createTempDirectory("graftsigeps").toString
    Dedup.writeCorpusSignatures(spark, dir, store)
    val got = Dedup.dd_incremental_stored(spark, dir, store, threshold = 0.55)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((4L, "near_dup", 0L, 0.55)),
      s"the J=0.55 boundary pair must survive the guarded pruning; got ${got.toSeq}")
  }

  test("ann_sq: zero-norm vectors score -1 (never NaN rank-1); zero-norm queries are dropped") {
    val good = (seed: Long) =>
      Seq.tabulate(8)(i => ((seed * 31 + i * 7) % 13 + 1).toFloat)
    val dir = tmpEmb(Seq(
      (0L, good(1), "a"),
      (1L, Seq.fill(8)(0f), "zq"), // zero-norm QUERY — must be dropped
      (2L, good(2), "a"), (3L, good(3), "a"), (4L, good(4), "a"),
      (5L, good(5), "a"),
      (6L, Seq.fill(8)(0f), "zc"))) // zero-norm CORPUS vector
    val rows = Similarity.ann_sq(spark, dir, nQueries = 2, k = 10).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L)) // query 1 dropped
    assert(rows.forall(r => !r.getDouble(4).isNaN))
    assert(rows.minBy(_.getLong(1)).getDouble(4) > -1.0) // rank-1 is real
    val zeros = rows.filter(r => Set(1L, 6L)(r.getLong(2)))
    assert(zeros.forall(_.getDouble(4) == -1.0))
    assert(zeros.map(_.getLong(1)).toSet == Set(5L, 6L)) // zeros rank LAST
  }

  test("compactIvfPqIndex: fails fast on a stale codes_pre_compact from a crashed prior compact") {
    val dir = "/root/testdata/sf0.001"
    val path = java.nio.file.Files.createTempDirectory("graftivfstale").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(path, "codes_pre_compact"))
    val e = intercept[IllegalArgumentException](
      Similarity.compactIvfPqIndex(spark, path))
    assert(e.getMessage.contains("codes_pre_compact"))
    // the guard must not leak the writer lock: after recovery (here, the
    // stale dir is judged empty and removed) compaction runs clean
    java.nio.file.Files.delete(java.nio.file.Paths.get(path, "codes_pre_compact"))
    Similarity.compactIvfPqIndex(spark, path)
  }

  test("null-text docs never dedup-pair: exact/fingerprint/shingle families exclude them") {
    val dir = tmpDocs(Seq(
      (1L, null, "en", "s", 1L),
      (2L, null, "en", "s", 1L), // two unrelated null-text docs
      (3L, "", "en", "s", 1L), // genuinely empty — distinct from null
      (4L, "alpha beta gamma delta", "en", "s", 1L),
      (5L, "alpha beta gamma delta", "en", "s", 1L))) // real exact dup of 4
    val exact = Dedup.dd_exact(spark, dir).collect()
    assert(exact.forall(_.getString(0) != null)) // no null-digest group
    assert(exact.map(_.getLong(2)).sum == 3L) // docs 3,4,5 only
    assert(Dedup.dd_exact_best(spark, dir).collect().forall(_.getString(0) != null))
    // fingerprint: null docs must NOT merge with the empty doc via
    // concat_ws(null array) = "" — the only surviving group is (4,5)
    val fp = Dedup.dd_fingerprint(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(fp == Seq((4L, 2L)))
    // shingle family: null-text docs form no clique (the null-shs group
    // would otherwise fabricate jaccard-1.0 pairs between docs 1 and 2)
    def ab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ab(Dedup.dd_ngram_jaccard(spark, dir)) == Set((4L, 5L)))
    assert(ab(Dedup.dd_containment(spark, dir)) == Set((4L, 5L)))
    assert(Dedup.dd_cluster_jaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((4L, 4L), (5L, 4L)))
  }

  test("zero-norm embeddings never near-dup: embed cosine/lsh/semdedup score them -1, never NaN") {
    val unit = (axis: Int) => Seq.tabulate(8)(i => if (i == axis) 1f else 0f)
    val dir = tmpEmb(Seq(
      (0L, Seq.fill(8)(0f), "z"),
      (1L, Seq.fill(8)(0f), "z"), // identical zero vectors: still no signal
      (2L, unit(0), "a"), (3L, unit(0), "a"), // true exact-dup pair
      (4L, unit(1), "a"))) // orthogonal to 2/3
    def ab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ab(Dedup.dd_embed_cosine(spark, dir, threshold = 0.4)) == Set((2L, 3L)))
    assert(ab(Dedup.dd_embed_lsh(spark, dir, threshold = 0.4)) == Set((2L, 3L)))
    val sd = Dedup.dd_semdedup(spark, dir, k = 2, threshold = 0.4).collect()
    assert(sd.map(_.getLong(2)).sum == 1L) // exactly vec 3 flagged
    // the hot-bucket fail-fast (dd_embed_cosine's maxVectors convention)
    val e = intercept[IllegalArgumentException](
      Dedup.dd_embed_lsh(spark, dir, maxBucketVectors = 0L))
    assert(e.getMessage.contains("quadratic per bucket"))
  }

  test("cosine ANN family: zero-norm corpus vectors score -1 (never NaN rank-1); zero-norm queries dropped; planes guarded") {
    val unit = (axis: Int) => Seq.tabulate(8)(i => if (i == axis) 1f else 0f)
    val dir = tmpEmb(Seq(
      (0L, unit(0), "a"),
      (1L, Seq.fill(8)(0f), "zq"), // zero-norm QUERY: must be dropped
      (2L, unit(0), "a"), (3L, unit(1), "a"), (4L, unit(2), "a"),
      (5L, Seq.fill(8)(0f), "zc"))) // zero-norm corpus vector
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.collect()
      assert(rows.map(_.getLong(0)).toSet == Set(0L)) // query 1 dropped
      assert(rows.forall(r => !r.getDouble(3).isNaN))
      assert(rows.minBy(_.getLong(1)).getLong(2) == 2L) // true nearest wins
    }
    check(Similarity.ann_bruteforce(spark, dir, nQueries = 2, k = 10))
    check(Similarity.ann_lsh(spark, dir, nQueries = 2, k = 10, planes = 4, nProbes = 16))
    check(Similarity.ann_ivf(spark, dir, nQueries = 2, k = 10, nlist = 2, nprobe = 2))
    // the 1<<planes overflow guard
    val e = intercept[IllegalArgumentException](
      Similarity.ann_lsh(spark, dir, planes = 32))
    assert(e.getMessage.contains("out of range"))
  }

  test("index guards: null-embedding deltas and duplicate query batches are rejected loudly") {
    val dir = "/root/testdata/sf0.001"
    val path = java.nio.file.Files.createTempDirectory("graftivfguard").toString
    Similarity.writeIvfPqIndex(spark, dir, path)
    val emb = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val nullRow = emb.limit(1)
      .select((col("vec_id") + 5000000L).as("vec_id"),
        lit(null).cast(emb.schema("embedding").dataType).as("embedding"))
    val e1 = intercept[IllegalArgumentException](
      Similarity.appendToIvfPqIndex(spark, path, nullRow))
    assert(e1.getMessage.contains("NULL embedding"))
    val q = emb.filter(col("vec_id") < 4)
    val e2 = intercept[IllegalArgumentException](
      Similarity.searchIvfPqIndex(spark, path, q.unionByName(q)))
    assert(e2.getMessage.contains("repeats vec_ids"))
    val e3 = intercept[IllegalArgumentException](
      Similarity.searchIvfPqIndexDistributed(spark, path, q.unionByName(q)))
    assert(e3.getMessage.contains("repeats vec_ids"))
    // the failed guards must not leak the writer lock
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_append.lock")))
  }

  test("curation guards: degenerate params fail loudly; null text excluded from samplers; empty input censuses zeros") {
    val dir0 = tmpDocs(Seq((1L, "a b c", "en", "s", 1L)))
    intercept[IllegalArgumentException](Curation.samp_pack(spark, dir0, budget = 0))
    intercept[IllegalArgumentException](Curation.dd_para(spark, dir0, chunkWords = 0))
    intercept[IllegalArgumentException](Curation.decon_jaccard(spark, dir0, threshold = 0.0))
    // null text excluded from every rank-by-hash sampler (md5(null) sorts
    // FIRST in Spark, LAST in DuckDB — it must never rank at all)
    val dir = tmpDocs(Seq(
      (1L, null, "en", "s", 1L), (2L, null, "de", "s", 1L),
      (3L, "alpha beta", "en", "s", 1L), (4L, "gamma delta", "de", "s", 1L)))
    assert(Curation.samp_reservoir(spark, dir).collect()
      .map(_.getLong(1)).toSet == Set(3L, 4L))
    assert(Curation.samp_split(spark, dir).collect().map(_.getLong(2)).sum == 2L)
    assert(Curation.samp_balanced(spark, dir).collect().map(_.getLong(1)).sum == 2L)
    assert(Curation.samp_pack(spark, dir).collect().map(_.getLong(2)).sum == 2L)
    // empty corpus: the funnel censuses integer zeros, never NULL rows
    val e = tmpDocs(Seq.empty)
    val cur = Curation.pipeline_curate(spark, e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cur == Map("0_raw" -> 0L, "1_quality" -> 0L, "2_fluency" -> 0L,
      "3_dedup" -> 0L))
    // empty eval slice: decon_embed reports uncontaminated, not zero rows
    val embDir = tmpEmb(Seq(
      (0L, Seq.fill(8)(0f), "z"), // the only eval vector, zero-norm: dropped
      (70L, Seq.tabulate(8)(i => i.toFloat + 1f), "a")))
    val de = Curation.decon_embed(spark, embDir, nEval = 64).collect()
    assert(de.length == 1 && de.head.getLong(0) == 70L && !de.head.getBoolean(3))
  }

  test("tx_readability: hand-computed sentence and syllable counts (the fixture corpus has no terminators)") {
    // the synthetic corpus contains no [.!?], so without this planted doc
    // the n_sentences regex is dead signal the oracle cannot exercise
    val dir = tmpDocs(Seq(
      (1L, "the cat sat. the dog ran! did it run? yes", "en", "s", 1L),
      (2L, "no terminators here", "en", "s", 1L)))
    val got = TextAnalysis.tx_readability(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc1: 10 ws-words; terminator runs . ! ? = 3; one vowel-group per
    // word ("yes" → the single run "ye": y and e are both in the class)
    assert(got(1L) == ((10L, 3L, 10L)))
    // doc2: no(1) + terminators(e,i,a,o = 4) + here(e,e = 2) = 7 syllables
    assert(got(2L) == ((3L, 0L, 7L)))
  }

  test("tx_extract: boilerplate lines drop, content recovered bit-for-bit; unplanted docs pass through") {
    val dir = tmpDocs(Seq(
      (3L, "alpha beta gamma delta content words here", "en", "s", 1L), // planted (3%3==0)
      (4L, "plain document with no markup at all", "en", "s", 1L), // unplanted
      (5L, "ab", "en", "s", 1L))) // below minWords: nothing extracted
    val got = TextAnalysis.tx_extract(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(6)))).toMap
    val md5Of = (t: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 3: a 5-line page (head+script/style, nav, content, footer, tail);
    // ONLY the content paragraph survives (head strips to 't3', nav/footer
    // are link-dense), and extraction recovers the ORIGINAL text exactly
    assert(got(3L)._1 && got(3L)._2 == 5L && got(3L)._3 == 1L && got(3L)._4 == 6L)
    assert(got(3L)._5 == md5Of("alpha beta gamma delta content words here"))
    // doc 4: no markup — one line, kept, digest = md5(text)
    assert(!got(4L)._1 && got(4L)._2 == 1L && got(4L)._3 == 1L)
    assert(got(4L)._5 == md5Of("plain document with no markup at all"))
    // doc 5: real but too short — honestly reported as zero kept lines
    assert(got(5L)._3 == 0L && got(5L)._5 == md5Of(""))
  }

  test("tx_url family: parse fields, blocklist verdicts, and normalization collapse hand-checked") {
    val dir = tmpDocs(Seq(
      (0L, "a", "en", "s", 1L), // https://www.example.com:8080/p/0?q=0
      (2L, "b", "en", "s", 1L), // https://spam.casino-ads.net/p/2 → blocked
      (5L, "c", "en", "s", 1L), // http://ads.tracker.io/p/5?q=2 → blocked
      (7L, "d", "en", "s", 1L), // http://www.example.com/p/7
      (20L, "e", "en", "s", 1L), // https://news.site.org/p/0?q=2
      (140L, "f", "en", "s", 1L))) // www.example.com/p/0?q=2 — re-crawl of doc 0
    val u = TextAnalysis.tx_url(spark, dir).collect().map(r => r.getLong(0) -> r).toMap
    assert(u(0L).getString(1) == "https://www.example.com:8080/p/0?q=0")
    assert(u(0L).getString(2) == "https" && u(0L).getString(3) == "www.example.com")
    assert(u(0L).getLong(4) == 8080L && u(0L).getString(5) == "/p/0")
    assert(u(0L).getString(6) == "example.com" && !u(0L).getBoolean(7))
    assert(u(7L).isNullAt(4)) // no port
    assert(u(2L).getBoolean(7) && u(2L).getString(6) == "casino-ads.net")
    assert(u(5L).getBoolean(7) && u(5L).getString(6) == "tracker.io")
    // URL dedup: docs 0 and 140 differ in scheme detail (port, query) but
    // normalize to example.com/p/0 — one keeper, the re-crawl collapses
    val dd = TextAnalysis.tx_url_dedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(dd.toSeq == Seq(("example.com/p/0", 0L, 2L)))
    // host census per registered domain with the blocklist verdict
    val hosts = TextAnalysis.tx_url_hosts(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(hosts("example.com") == ((3L, 1L, false)))
    assert(hosts("casino-ads.net") == ((1L, 1L, true)))
    assert(hosts("tracker.io") == ((1L, 1L, true)))
    assert(hosts("site.org") == ((1L, 1L, false)))
  }

  test("tx_score: margin equals an independent hashed-bigram reference; gate is the exact integer margin > 0") {
    val dir = tmpDocs(Seq(
      (1L, "alpha beta gamma", "en", "s", 1L),
      (2L, "zz", "en", "s", 1L))) // single word → whole-doc shingle
    def ref(text: String): Long = {
      val ws = text.split(" ")
      val grams = if (ws.length < 2) Seq(text)
        else ws.sliding(2).map(_.mkString(" ")).toSeq
      grams.map { g =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        TextAnalysis.scoreWeights("0123456789abcdef".indexOf(h.head)).toLong
      }.sum
    }
    val got = TextAnalysis.tx_score(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got(1L)._1 == 2L && got(1L)._2 == ref("alpha beta gamma"))
    assert(got(2L)._1 == 1L && got(2L)._2 == ref("zz"))
    assert(got(1L)._3 == (got(1L)._2 > 0) && got(2L)._3 == (got(2L)._2 > 0))
  }

  test("tx_perplexity: hand-computed stupid-backoff scores on a planted corpus; min-length and null docs excluded") {
    // ref slice = doc_id % 5 == 0 → doc 0 only. Its LM: tokens a:2 b:1 c:1
    // (T=4), bigrams "a b":1 "b a":1 "a c":1. Seen scores: "a b" = 10⁶·1/2
    // = 500000, "b a" = 10⁶·1/1 = 1000000, "a c" = 500000. Backoff:
    // ⌊400000·c1(w2)/4⌋ → "c a" = 200000 (via c1(a)=2), OOV w2 = 0.
    val dir = tmpDocs(Seq(
      (0L, "a b a c", "en", "web", 7L),   // ref doc; self-scored mean 666666
      (1L, "a b x", "en", "web", 5L),     // 500000 + 0 → mean 250000
      (2L, "b a b a", "en", "web", 7L),   // 10⁶+5·10⁵+10⁶ → mean 833333
      (3L, "c a", "en", "web", 3L),       // pure backoff → mean 200000
      (4L, "x y", "en", "web", 3L),       // OOV everywhere → mean 0
      (6L, "z", "en", "web", 1L),         // 1 token → not scored
      (7L, null, "en", "web", 0L)))       // null text → not scored
    val got = TextAnalysis.tx_perplexity(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(got(0L) == ((3L, 2000000L, 666666L, "head")))
    assert(got(1L) == ((2L, 500000L, 250000L, "middle")))
    assert(got(2L) == ((3L, 2500000L, 833333L, "head")))
    assert(got(3L) == ((1L, 200000L, 200000L, "middle")))
    assert(got(4L) == ((1L, 0L, 0L, "tail")))
    // an empty reference slice must fail loudly, not divide by zero
    val noRef = tmpDocs(Seq((1L, "a b", "en", "web", 3L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.tx_perplexity(spark, noRef)
    }
  }

  test("tx_colloc: hand-computed integer PMI lifts; minCount cut, short/null docs excluded, ordered ties") {
    // c1: strong:3 tea:4 hot:2 coffee:1, T=10 (doc 2 has 1 token and doc 3
    // is null — both contribute nothing). c2 at minCount=2: "strong tea":3,
    // "tea strong":2 (the hot/coffee bigrams are hapax — cut).
    // lift("strong tea") = ⌊10⁶·3/3⌋·10 // 4 = 2_500_000
    // lift("tea strong") = ⌊10⁶·2/4⌋·10 // 3 = 1_666_666
    val dir = tmpDocs(Seq(
      (0L, "strong tea strong tea strong tea", "en", "web", 31L),
      (1L, "hot tea hot coffee", "en", "web", 17L),
      (2L, "z", "en", "web", 1L),
      (3L, null, "en", "web", 0L)))
    val got = TextAnalysis.tx_colloc(spark, dir, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("strong tea", 3L, 3L, 4L, 2500000L),
      ("tea strong", 2L, 4L, 3L, 1666666L)))
    // an unscoreable corpus must fail loudly, not rank nothing silently
    val empty = tmpDocs(Seq((1L, "solo", "en", "web", 4L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.tx_colloc(spark, empty)
    }
  }

  test("tx_bm25: stuffed doc outranks a longer diluted one; log2Fp matches true log2; degenerate inputs refuse") {
    // log2Fp is the pinned integer recurrence both engines implement —
    // check it against the float log it replaces (within 2^-19 of a bit)
    // and against hand-computable exact points (powers of two).
    for ((num, den) <- Seq((2L, 1L), (1024L, 1L), (96L, 3L))) {
      val bits = java.lang.Long.numberOfTrailingZeros(num / den)
      assert(TextAnalysis.log2Fp(num, den) == bits.toLong << 20,
        s"log2Fp($num/$den) must be exact at a power of two")
    }
    for ((num, den) <- Seq((3L, 2L), (1002L, 5L), (999999L, 7L), (1L, 1L))) {
      val got = TextAnalysis.log2Fp(num, den).toDouble / (1L << 20)
      val want = math.log(num.toDouble / den) / math.log(2.0)
      assert(math.abs(got - want) < 1e-5, s"log2Fp($num/$den): $got vs $want")
    }
    // Relevance ordering: doc 0 is short and stuffed with the query
    // terms; doc 1 carries the SAME term counts diluted into a much
    // longer document — BM25's length normalization must rank 0 first.
    // Doc 2 hits no term (dropped); doc 3 is null (excluded).
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val dir = tmpDocs(Seq(
      (0L, "merge sort merge dup window sort merge", "en", "web", 38L),
      (1L, s"merge sort merge dup window sort merge $filler", "en", "web", 500L),
      (2L, "nothing relevant here", "en", "web", 21L),
      (3L, null, "en", "web", 0L)))
    val got = TextAnalysis.tx_bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L),
      s"stuffed doc must outrank the diluted twin; got ${got.toSeq}")
    assert(got(0)._4 > got(1)._4, "strictly greater score, not a tie broken by id")
    assert(got.forall(_._3 == 4L), "both ranked docs hit all 4 query terms")
    // degenerate inputs refuse loudly
    intercept[IllegalArgumentException](
      TextAnalysis.tx_bm25(spark, dir, query = Seq.empty))
    intercept[IllegalArgumentException](
      TextAnalysis.tx_bm25(spark, dir, query = Seq("two words")))
    intercept[IllegalArgumentException](
      TextAnalysis.tx_bm25(spark, dir, query = Seq("dup", "dup")))
    val allNull = tmpDocs(Seq((9L, null, "en", "web", 0L)))
    intercept[IllegalArgumentException](TextAnalysis.tx_bm25(spark, allNull))
  }

  test("tx_score_train: weights match an independent driver-side perceptron; trained gate beats the fixed weights") {
    val dir = "/root/testdata/sf0.001"
    // independent reference: features, teacher labels, all 8 perceptron
    // rounds over the centered (z, n) parameterization, and the fold back
    // to effective bucket weights — recomputed in plain JVM arithmetic
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val teacher = TextAnalysis.teacherWeights.map(_.toLong)
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getString(1))
    val fx = rows.map { text =>
      val ws = text.split(" ", -1)
      val grams =
        if (ws.length < 2) Seq(text) else ws.sliding(2).map(_.mkString(" ")).toSeq
      val x = Array.fill(16)(0L)
      grams.foreach(g => x("0123456789abcdef".indexOf(md5hex(g).head)) += 1L)
      val n = grams.length.toLong
      val y: Long = if ((0 until 16).map(i => teacher(i) * x(i)).sum > 0) 1L else -1L
      val z = (0 until 16).map(i => 16L * x(i) - n).toArray :+ n
      (y, x, z)
    }
    val w = Array.fill(17)(0L)
    for (_ <- 1 to 8) {
      val g = Array.fill(17)(0L)
      fx.foreach { case (y, _, z) =>
        val m = (0 until 17).map(i => w(i) * z(i)).sum
        if (y * m <= 0) (0 until 17).foreach(i => g(i) += y * z(i))
      }
      (0 until 17).foreach(i => w(i) += g(i))
    }
    val shift = w(16) - w.take(16).sum
    val eff = (0 until 16).map(i => 16L * w(i) + shift)
    val got = TextAnalysis.tx_score_train(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == (0L until 16L))
    assert(got.map(_._2).toSeq == eff,
      "distributed training must equal the sequential reference exactly")
    // the whole point: the trained gate recovers the teacher's decision
    // boundary far better than the fixed public weights track it
    def acc(weights: Seq[Long]): Double = fx.count { case (y, x, _) =>
      ((0 until 16).map(i => weights(i) * x(i)).sum > 0) == (y == 1L)
    }.toDouble / fx.length
    val trained = acc(eff)
    val fixed = acc(TextAnalysis.scoreWeights.map(_.toLong))
    assert(trained > fixed,
      s"trained accuracy $trained must beat fixed-weight accuracy $fixed")
    assert(trained >= 0.95, s"the plant is linearly learnable; got $trained")
  }

  test("lexical sketch recall vs exact n-gram Jaccard ground truth: regimes measured and pinned") {
    // the SemDeDup-recall precedent applied to the lexical sketches:
    // ground truth = dd_ngram_jaccard (exact, recall 1 by construction);
    // recall = |sketch ∩ truth| / |truth| per exact-J band. Deterministic
    // end to end (xxhash sketches, fixed corpus + plant), so the measured
    // numbers are stable, not flaky floors.
    val dir = "/root/testdata/sf0.01"
    val raw = graft.sources.Tables.loadParallel(spark, dir, "documents")
    val maxId = raw.agg(max(col("doc_id"))).first().getLong(0)
    // borderline plant: every 5th doc re-emitted with a mutated copy of
    // its own words appended — roughly doubles the shingle set → J ≈ 0.5
    val planted = raw.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + maxId + 1).as("doc_id"),
        concat(col("text"), lit(" "),
          regexp_replace(col("text"), "([a-z0-9]+)", "q$1x")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val tmp = java.nio.file.Files.createTempDirectory("graftrecall").toString
    raw.unionByName(planted).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val truth = Dedup.dd_ngram_jaccard(spark, tmp, threshold = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val mh = Dedup.dd_minhash(spark, tmp, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.dd_simhash(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(s: Set[(Long, Long)], lo: Double, hi: Double): (Double, Int) = {
      val t = truth.filter { case (_, j) => j >= lo && j < hi }.keySet
      (if (t.isEmpty) -1.0 else (t & s).size.toDouble / t.size, t.size)
    }
    // minhash: trustworthy in the near-identical regime, honest loss below
    val (mHigh, nHigh) = recall(mh, 0.8, 1.01)
    val (mBorder, nBorder) = recall(mh, 0.45, 0.6)
    info(f"minhash recall: J>=0.8 $mHigh%.3f (n=$nHigh); J in [0.45,0.6) $mBorder%.3f (n=$nBorder)")
    assert(nHigh >= 20 && mHigh >= 0.95, f"near-identical regime: $mHigh%.3f")
    assert(nBorder >= 50 && mBorder > 0.2 && mBorder < 0.5,
      f"borderline loss should match banding theory (~0.42 at J=0.5): $mBorder%.3f")
    // simhash at 3/64 bits: only the most-identical tail, zero below 0.8
    val (sTail, nTail) = recall(sh, 0.95, 1.01)
    val (sLow, _) = recall(sh, 0.3, 0.8)
    info(f"simhash recall: J>=0.95 $sTail%.3f (n=$nTail); J in [0.3,0.8) $sLow%.3f")
    assert(nTail >= 20 && sTail >= 0.5, f"most-identical tail: $sTail%.3f")
    assert(sLow <= 0.05, f"simhash must NOT pretend to reach J<0.8: $sLow%.3f")
  }

  test("idx_health: repeat invocations reuse the per-JVM scratch index and report identically") {
    val dir = "/root/testdata/sf0.001"
    val first = Similarity.idx_health(spark, dir).collect().map(_.toSeq).toSeq
    val t0 = System.nanoTime()
    val second = Similarity.idx_health(spark, dir).collect().map(_.toSeq).toSeq
    info(s"warm idx_health: ${(System.nanoTime() - t0) / 1000000} ms (no rebuild)")
    assert(first == second && first.nonEmpty)
  }

  test("multimodal guards: null text excluded at mediaTable; no phantom frames; params fail loud") {
    val dir = tmpDocs(Seq(
      (1L, null, "en", "s", 1L),
      (2L, null, "en", "s", 1L), // two null docs: mm_dedup must not fake a group
      (3L, "short", "en", "s", 1L), // 5 bytes < frameBytes → ZERO complete frames
      (4L, "x" * 80, "en", "s", 1L))) // 2 complete 32-byte frames
    val media = Multimodal.mediaTable(spark, dir)
    assert(media.count() == 2) // nulls excluded once, all consumers inherit
    assert(Multimodal.mm_dedup(spark, dir).collect().forall(_.getString(0) != null))
    assert(Multimodal.extractFeatures(media).count() == 2) // no NPE row
    val frames = Multimodal.sampleFrames(media)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byDoc.contains(3L)) // the old clamp emitted a truncated frame 0
    assert(byDoc(4L) == 1L)
    assert(frames.collect().forall(_.getAs[Array[Byte]]("frame_bytes").length == 32))
    intercept[IllegalArgumentException](Multimodal.extractFeatures(media, batchSize = 0))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(media, frameBytes = 0))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(media, stride = 0))
  }

  test("log2FpSql: bit-parity with log2Fp across the full [1, 2^33) domain; out-of-range inputs raise in-plan") {
    import graft.operators.TextAnalysis.{log2Fp, log2FpSql}
    // boundaries: small values, every power of two in range and its
    // neighbors (the exponent/normalization seams), the domain edge,
    // plus a seeded pseudorandom sweep of the interior
    val rnd = new scala.util.Random(42)
    val vs = ((1L to 64L) ++
      (1 to 32).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1)) ++
      Seq((1L << 33) - 1) ++
      Seq.fill(500)(1L + (rnd.nextLong().abs % (((1L << 33) - 1))))).distinct
    val got = vs.toDF("v")
      .selectExpr("v", s"${log2FpSql("v")} AS fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vs.foreach { v =>
      assert(got(v) == log2Fp(v, 1L),
        s"log2FpSql($v)=${got(v)} != log2Fp=${log2Fp(v, 1L)}")
    }
    // the in-plan guard is the same contract as log2Fp's require
    for (bad <- Seq(0L, 1L << 33)) {
      val e = intercept[Exception] {
        Seq(bad).toDF("v").selectExpr(s"${log2FpSql("v")} AS fp").collect()
      }
      assert(e.getMessage != null && e.getMessage.contains("out of"),
        s"expected in-plan range refusal for $bad, got: ${e.getMessage}")
    }
    // null propagates as null (the SQL convention), never a crash
    val nullRow = Seq[Option[Long]](None).toDF("v")
      .selectExpr(s"${log2FpSql("v")} AS fp").collect().head
    assert(nullRow.isNullAt(0))
  }

  /** Write a tiny events table to a temp dir shaped like testdata. */
  private def tmpEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Write a tiny documents corpus to a temp dir shaped like testdata. */
  private def tmpDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftdocs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Write a tiny embeddings table to a temp dir shaped like testdata. */
  private def tmpEmb(rows: Seq[(Long, Seq[Float], String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftemb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }
}
