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
    // test covers the reserve/install/evict CONSISTENCY of that split
    // under contention (every evictContext clears the hook record,
    // forcing the next getOrBuild to re-reserve and re-install) — it
    // does NOT exercise the stop() deadlock cycle itself, which needs a
    // stopping context and this JVM allows only the suite's shared one.
    // What it DOES pin hard: the hundreds of evict/re-install rounds
    // below must not accumulate listeners on the live bus (the round-15
    // advice leak — evictContext now detaches the installed listener).
    val memo = new SessionMemo[Int, Int](maxPerSession = 4)
    def memoListenersOnBus(): Int = {
      // LiveListenerBus.listeners() is private[spark]; reach it by
      // reflection — the count of THIS suite's anonymous listeners is
      // the accumulation gauge.
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      val ls = bus.getClass.getMethod("listeners").invoke(bus)
        .asInstanceOf[java.util.List[_]]
      var n = 0
      ls.forEach(l => if (l.getClass.getName.contains("SessionMemo")) n += 1)
      n
    }
    val baseline = memoListenersOnBus()
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
    // ~800 evict + ~800 re-install rounds just ran against one context;
    // with per-context listener tracking at most a handful can be live at
    // once (an install racing the final evicts). Before the round-15 fix
    // this count was in the hundreds.
    val after = memoListenersOnBus() - baseline
    assert(after <= 4,
      s"listeners accumulated on the bus across evict/re-install cycles: $after")
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

  // ---- ValueMemo: the plain-value sibling now backs BOTH trainer caches
  // (langid + score weights), so it gets the same direct coverage as
  // SessionMemo instead of being tested only through the trainers.

  test("ValueMemo: hits cache and LRU-bounds at maxEntries with access-refreshed recency") {
    val memo = new ValueMemo[Int, String](maxEntries = 2)
    var builds = 0
    def b(k: Int): String = memo.getOrBuild(k) { builds += 1; s"v$k" }
    assert(b(1) == "v1" && b(1) == "v1" && builds == 1, "second access must hit")
    assert(b(2) == "v2" && builds == 2 && memo.size == 2)
    assert(b(1) == "v1" && builds == 2, "re-access refreshes key 1's recency")
    assert(b(3) == "v3" && builds == 3 && memo.size == 2,
      "third key must evict exactly one entry")
    assert(b(1) == "v1" && builds == 3, "key 1 was refreshed, must survive")
    assert(b(2) == "v2" && builds == 4, "key 2 was the LRU victim, rebuilt")
  }

  test("ValueMemo: concurrent same-key builds deduplicate to exactly one build; distinct keys never serialize") {
    val memo = new ValueMemo[String, Int]()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      // 6 racers on ONE key: all must see the same value, one build total
      val futs = (0 until 6).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            gate.await()
            memo.getOrBuild("w") { Thread.sleep(50); builds.incrementAndGet(); 7 }
          }
        })
      }
      gate.countDown()
      assert(futs.map(_.get(10, java.util.concurrent.TimeUnit.SECONDS)).forall(_ == 7))
      assert(builds.get == 1, s"racers on one key must share one build, saw ${builds.get}")
      // distinct keys must not queue behind a slow build (the retired
      // global-lock trainer cache made unrelated corpora serialize): a
      // fast key finishes while a deliberately slow one is mid-build
      val slowStarted = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val slow = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = memo.getOrBuild("slow") {
          slowStarted.countDown(); release.await(); 1
        }
      })
      assert(slowStarted.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // if builds serialized globally, this would block until `release`
      val fastDone = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = memo.getOrBuild("fast")(2)
      })
      assert(fastDone.get(10, java.util.concurrent.TimeUnit.SECONDS) == 2,
        "a different key must build while another key's build is in flight")
      release.countDown()
      assert(slow.get(10, java.util.concurrent.TimeUnit.SECONDS) == 1)
    } finally pool.shutdownNow()
  }

  test("ValueMemo: a failed build is not cached and unrelated keys are unaffected") {
    val memo = new ValueMemo[String, Int]()
    assert(memo.getOrBuild("ok")(7) == 7)
    var attempts = 0
    def flaky(): Int = memo.getOrBuild("flaky") {
      attempts += 1
      if (attempts == 1) sys.error("transient") else 42
    }
    intercept[RuntimeException](flaky())
    assert(flaky() == 42, "a transient failure must not be cached")
    assert(memo.getOrBuild("ok")(sys.error("must not rebuild")) == 7)
  }
}
