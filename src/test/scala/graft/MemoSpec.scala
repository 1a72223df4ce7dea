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

  test("SessionMemo: concurrent builds and context evictions make progress (listener installs outside the memo lock)") {
    // The round-14 advice deadlock: getOrBuild used to call
    // addSparkListener while HOLDING the memo lock, and the listener
    // dispatch thread takes that lock delivering ApplicationEnd — a
    // concurrent SparkContext.stop() (which holds the listener-bus
    // monitor while joining the dispatcher) could then cycle. The fix
    // reserves in `hooked` under the lock and installs outside it. This
    // smoke test drives the reserve/install/evict edges hard from many
    // threads — every evictContext clears the hook reservation, forcing
    // the next getOrBuild to re-reserve and re-install — and must finish
    // well inside the timeout; a re-introduced install-under-lock shows
    // up here as lock-ordering contention the moment a bus stall appears.
    val memo = new SessionMemo[Int, Int](maxPerSession = 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val futs = (0 until 8).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            var i = 0
            while (i < 200) {
              if (t % 2 == 0) assert(memo.getOrBuild(spark, i % 6)((i % 6) * 10) == (i % 6) * 10)
              else memo.evictContext(spark.sparkContext)
              i += 1
            }
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      futs.foreach(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(errs.isEmpty, s"concurrent memo traffic failed: ${errs.peek()}")
    // after the storm the memo still functions
    assert(memo.getOrBuild(spark, 99)(990) == 990)
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
