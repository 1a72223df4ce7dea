package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.HeavyHitters.heavyHitters

/** Misra–Gries sketch semantics: exact regime (capacity ≥ distinct),
  * lossy-regime guarantees (the frequent-items bound survives partial
  * aggregation + merge), and the blocklist scrub operator's invariants.
  * The corpus-level results are pinned by the DuckDB oracles
  * (tx_heavy / tx_blocklist); these drive the regimes the oracle can't.
  */
class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def hh(tokens: Seq[String], capacity: Int, partitions: Int): Map[String, Long] =
    tokens.toDF("token")
      .repartition(partitions) // force multiple partial buffers + merges
      .agg(heavyHitters(col("token"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.token", $"e.n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: capacity >= distinct tokens reproduces exact counts") {
    val tokens = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c") ++ Seq("d")
    val got = hh(scala.util.Random.shuffle(tokens), capacity = 8, partitions = 7)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 9L, "d" -> 1L))
  }

  test("lossy regime: undercount <= n/capacity and heavy items always survive") {
    // 2000 heavy occurrences over 4 tokens + 900 singletons: capacity 16
    // gives epsilon = n/16 ≈ 181, far below each heavy count of 500.
    val heavy = Seq("w", "x", "y", "z").flatMap(t => Seq.fill(500)(t))
    val noise = (0 until 900).map(i => s"noise$i")
    val all = scala.util.Random.shuffle(heavy ++ noise)
    val n = all.size
    val cap = 16
    val got = hh(all, cap, partitions = 13)
    assert(got.size <= cap, "summary never exceeds capacity")
    for (t <- Seq("w", "x", "y", "z")) {
      assert(got.contains(t), s"item with freq > n/capacity must be present: $t")
      assert(got(t) <= 500L, "MG estimates never overcount")
      assert(got(t) >= 500L - n / cap, "undercount bounded by n/capacity")
    }
    // every reported estimate is a valid undercount of some true frequency
    got.foreach { case (t, est) =>
      val truth = if (Set("w", "x", "y", "z")(t)) 500L else 1L
      assert(est <= truth)
    }
  }

  test("eval order is deterministic: count desc, then token asc") {
    val rows = Seq("b", "b", "a", "a", "c").toDF("token")
      .agg(heavyHitters(col("token"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.token").as[String].collect()
    assert(rows.toSeq == Seq("a", "b", "c")) // a=2,b=2 tie → token order; c=1 last
  }

  test("null tokens are ignored; empty input yields an empty summary") {
    val got = Seq(Some("a"), None, Some("a"), None).toDF("token")
      .agg(heavyHitters(col("token"), 4).as("hh"))
      .select(size(col("hh")).as("k"), col("hh").getItem(0).getField("n").as("n0"))
      .collect().head
    assert(got.getInt(0) == 1 && got.getLong(1) == 2L)
    val empty = Seq.empty[String].toDF("token")
      .agg(heavyHitters(col("token"), 4).as("hh"))
      .select(size(col("hh"))).collect().head.getInt(0)
    assert(empty == 0)
  }

  test("grouped heavy hitters: independent summaries per group") {
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "b"), ("g2", "b"), ("g2", "b")).toDF("g", "token")
    val got = df.groupBy("g").agg(heavyHitters(col("token"), 4).as("hh"))
      .select(col("g"), col("hh").getItem(0).getField("token").as("top"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("g1" -> "a", "g2" -> "b"))
  }

  test("tx_blocklist: scrub removes exactly the blocklist tokens") {
    import graft.functions.TextFunctions.words
    val terms = TextAnalysis.blockTerms
    val isBlocked = (t: org.apache.spark.sql.Column) => t.isInCollection(terms)
    val df = Seq("dup fast slow table", "fast table", "dup dup").toDF("text")
      .select(
        size(filter(words(col("text")), isBlocked)).as("hits"),
        concat_ws(" ", filter(words(col("text")), t => !isBlocked(t))).as("scrubbed"))
    val got = df.collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((2, "fast table"), (0, "fast table"), (2, "")))
  }
}
