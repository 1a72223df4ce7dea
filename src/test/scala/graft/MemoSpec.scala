package graft

import org.scalatest.funsuite.AnyFunSuite

/** SessionMemo mechanics on controlled keys: hit/miss, the per-session LRU
  * bound, and context eviction. The eviction path is exercised through the
  * listener's exposed action ([[SessionMemo.evictContext]]) — stopping a
  * real context would kill the suite's shared session, and newSession()
  * clones share one context, so there is exactly one stop event to model.
  */
class MemoSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("SessionMemo: hits cache, LRU-bounds per session, releases all entries on context end") {
    val memo = new SessionMemo[Int, Int](maxPerSession = 2)
    var builds = 0
    def b(k: Int): Int = memo.getOrBuild(spark, k) { builds += 1; k * 10 }
    assert(b(1) == 10 && b(1) == 10 && builds == 1, "second access must hit")
    assert(b(2) == 20 && builds == 2)
    assert(memo.size == 2)
    assert(b(3) == 30 && builds == 3, "third key evicts the LRU entry")
    assert(memo.size == 2)
    assert(b(2) == 20 && builds == 3, "key 2 was refreshed by access, kept")
    assert(b(1) == 10 && builds == 4, "key 1 was the LRU victim, rebuilt")
    // the ApplicationEnd listener's action: every entry of the ended
    // context is released at once, without waiting for a later access
    memo.evictContext(spark.sparkContext)
    assert(memo.size == 0, "context end must release all of its entries")
    assert(b(1) == 10 && builds == 5, "memo must keep working after eviction")
  }

  test("SessionMemo: a failed build is not cached and unrelated keys are unaffected") {
    val memo = new SessionMemo[String, Int]()
    assert(memo.getOrBuild(spark, "ok")(7) == 7)
    var attempts = 0
    def flaky(): Int = memo.getOrBuild(spark, "flaky") {
      attempts += 1
      if (attempts == 1) sys.error("transient") else 42
    }
    intercept[RuntimeException](flaky())
    assert(flaky() == 42, "a transient failure must not be cached")
    assert(memo.getOrBuild(spark, "ok")(sys.error("must not rebuild")) == 7)
  }
}
