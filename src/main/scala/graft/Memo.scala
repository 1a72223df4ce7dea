package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for per-snapshot batch artifacts (domain-authority
  * censuses, cluster assignments, perplexity score frames, converged rank
  * stacks): frames that production computes ONCE per corpus snapshot and
  * every downstream consumer reads, so a façade that recomputed them per
  * invocation would be the wrong shape, not just slow.
  *
  * The discipline, implemented once for every cache in the library:
  *
  *  - '''Keyed by the owning session.''' The cached values hold
  *    checkpointed frames whose blocks die with their session
  *    ([[Checkpoints]]); a cross-session hit would hand out a dead frame.
  *    Dead-session entries are evicted on every access AND the moment
  *    their context ends (an ApplicationEnd listener installed on first
  *    use per context), so neither a session-per-request deployment nor
  *    a memo that goes idle after its session stops can retain stopped
  *    sessions or their frames.
  *  - '''In-flight builds are deduplicated per key.''' A lazy holder is
  *    inserted under the map lock and FORCED outside it: exactly one
  *    thread computes a given key (racers block on that key's holder
  *    monitor, not on the global lock), threads building different keys
  *    never serialize, and no losing thread ever materializes a duplicate
  *    checkpoint that would orphan its blocks (or, in reliable mode, its
  *    on-disk checkpoint directory) until session shutdown. A build that
  *    throws leaves the lazy uninitialized — Scala re-runs the
  *    initializer on the next access, so a transient failure is not
  *    cached — but the map entry is removed eagerly so an unrelated later
  *    caller starts a fresh build instead of re-entering a holder whose
  *    closure may have captured the failure's cause.
  *  - '''LRU-bounded per session.''' Live-session entries are capped at
  *    `maxPerSession` distinct keys (re-access refreshes recency); the
  *    evicted frame's blocks are released by the ContextCleaner when the
  *    frame is collected, same as any dropped checkpoint.
  */
final class SessionMemo[K, V](maxPerSession: Int = 32) {
  require(maxPerSession >= 1, s"SessionMemo: maxPerSession=$maxPerSession must be >= 1")

  private final class Holder(build: () => V) {
    lazy val value: V = build()
  }

  // LinkedHashMap iteration order = insertion order; re-inserting on every
  // hit makes the head the least-recently-used entry for eviction
  private val m =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, K), Holder]

  // Contexts with an ApplicationEnd eviction listener installed: without
  // it, a memo that goes IDLE after its session stops would retain the
  // stopped session and up to maxPerSession frames until some later
  // access on this same instance happens to run the access-time sweep.
  // The listener releases them the moment the context ends; the
  // access-time sweep stays as the fallback for contexts that refuse the
  // listener (already mid-stop). Keyed by SparkContext, not session:
  // newSession() clones share one context and one stop event. The value
  // tracks the hook's lifecycle (reserved → installed) so that
  //  (a) evictContext on a LIVE context can removeSparkListener — without
  //      that, repeated evict/access cycles re-install a fresh listener
  //      each round and listeners accumulate unboundedly on the bus; and
  //  (b) a failed install's rollback removes only ITS OWN reservation —
  //      an identity check, so a stale rollback that lost a race with a
  //      concurrent evict + re-access can never erase another thread's
  //      fresh reservation.
  private final class Hook {
    @volatile var listener: org.apache.spark.scheduler.SparkListener = null
  }
  private val hooked = scala.collection.mutable.Map
    .empty[org.apache.spark.SparkContext, Hook]

  /** Drop every entry owned by a session of `sc` and detach the eviction
    * listener if one was installed — exposed for the spec (stopping a real
    * context would kill the suite's shared session). NOT the path the
    * listener itself takes: removeSparkListener synchronizes on the
    * listener bus, whose stop() holds that monitor while joining the
    * dispatch thread, so calling it FROM the ApplicationEnd dispatch would
    * self-deadlock — the listener calls [[dropEntries]] directly (its bus
    * registration dies with the context anyway). */
  private[graft] def evictContext(sc: org.apache.spark.SparkContext): Unit = {
    val listener = dropEntries(sc)
    if (listener != null) {
      try sc.removeSparkListener(listener)
      catch { case _: Throwable => () } // bus already stopped: listener died with it
    }
  }

  /** Shared eviction core: drop `sc`'s entries + hook record under the
    * lock, return the installed listener (null if reservation-only) for
    * the caller to detach OUTSIDE the lock where that is safe. */
  private def dropEntries(
      sc: org.apache.spark.SparkContext): org.apache.spark.scheduler.SparkListener =
    m.synchronized {
      m.filterInPlace { case ((sess, _), _) => sess.sparkContext ne sc }
      hooked.remove(sc).map(_.listener).orNull
    }

  // Reserve-under-lock, install-outside-lock: addSparkListener synchronizes
  // on the LiveListenerBus, whose stop() holds that same monitor while
  // joining the dispatch thread — and the dispatch thread delivering
  // ApplicationEnd takes `m` (dropEntries). Installing while holding `m`
  // therefore closes a deadlock cycle with a concurrent
  // SparkContext.stop(): A holds m → waits on bus; stop() holds bus →
  // joins dispatcher; dispatcher waits on m. Session-per-request
  // deployments stop contexts concurrently with other sessions' builds,
  // so the race window is the intended workload. The split keeps `hooked`
  // consistent: reservation happens atomically with the map pass; a
  // successful install publishes the listener on OUR hook (or detaches the
  // orphan if a concurrent evict already dropped the reservation); a
  // failed install rolls back only our own reservation.
  private def installHook(
      sc: org.apache.spark.SparkContext, hook: Hook): Unit = {
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
        dropEntries(sc) // NOT evictContext: see its scaladoc
    }
    try {
      sc.addSparkListener(listener)
      val orphaned = m.synchronized {
        hooked.get(sc) match {
          case Some(h) if h eq hook => h.listener = listener; false
          // a concurrent evictContext dropped our reservation between the
          // reserve and this install (possibly a NEW reservation exists —
          // that one's own install owns it): our listener is an orphan
          case _ => true
        }
      }
      if (orphaned) {
        try sc.removeSparkListener(listener)
        catch { case _: Throwable => () }
      }
    } catch {
      // context mid-stop: the access-time sweep owns cleanup — and the
      // failed install must NOT leave sc pinned in `hooked` (nothing
      // else ever removes it, and the contains-check would block any
      // retry on a later, healthy access). Identity-guarded: only OUR
      // reservation is rolled back, never a successor's.
      case _: Throwable =>
        m.synchronized {
          hooked.get(sc).filter(_ eq hook).foreach(_ => hooked.remove(sc))
        }
    }
  }

  def getOrBuild(s: SparkSession, key: K)(build: => V): V = {
    val fullKey = (s, key)
    val sc = s.sparkContext
    val (holder, newHook) = m.synchronized {
      m.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      val hook = if (hooked.contains(sc)) null else {
        val h = new Hook // reserve; installHook publishes or rolls back
        hooked.update(sc, h); h
      }
      val h = m.get(fullKey) match {
        case Some(h) =>
          m.remove(fullKey); m.update(fullKey, h); h
        case None =>
          val mine = m.keysIterator.filter(_._1 eq s).toList
          if (mine.size >= maxPerSession) m.remove(mine.head)
          val h = new Holder(() => build)
          m.update(fullKey, h); h
      }
      (h, hook)
    }
    if (newHook != null) installHook(sc, newHook)
    try holder.value
    catch {
      case t: Throwable =>
        m.synchronized {
          // drop only OUR holder — a concurrent failure+rebuild may
          // already have replaced it with a healthy one
          m.get(fullKey).filter(_ eq holder).foreach(_ => m.remove(fullKey))
        }
        throw t
    }
  }

  /** Test hook: live entry count (dead sessions evicted first). */
  private[graft] def size: Int = m.synchronized {
    m.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    m.size
  }
}

/** The PLAIN-VALUE sibling of [[SessionMemo]] — the other half of the one
  * cache discipline in this library. Use it for deterministic, session-free
  * artifacts (trained weight vectors, merge-rule lists): pure values keyed
  * by their inputs that hold NO session, frame, or checkpoint references,
  * so a cross-session hit is correct by construction and session eviction
  * would only force pointless retraining. Everything frame-shaped stays in
  * [[SessionMemo]]; everything value-shaped lives here — never a
  * hand-rolled `mutable.Map` (the round-13 invariant, extended to values in
  * round 15 after the third ad-hoc cache appeared).
  *
  * Same mechanics as [[SessionMemo]] minus the session axis:
  *
  *  - '''In-flight builds deduplicate per key''' via the lazy-holder
  *    device: racers on one key block on that holder, builds of DIFFERENT
  *    keys never serialize (the old global-lock-around-train shape made
  *    unrelated corpora queue behind each other), and a throwing build is
  *    not cached (the entry is removed so the next caller starts fresh).
  *  - '''LRU-bounded''' at `maxEntries` keys, so a long-lived JVM that
  *    walks many corpus directories cannot grow without bound.
  *
  * Key contract: the key must CONTENT-ADDRESS the value. A corpus
  * directory key assumes the immutable-snapshot discipline every memo in
  * this library rides on — rewriting a corpus dir in place serves weights
  * trained on the old snapshot until the entry ages out; deploy new
  * snapshots to new paths (the [[AtomicSwap]] sinks already do).
  */
final class ValueMemo[K, V](maxEntries: Int = 64) {
  require(maxEntries >= 1, s"ValueMemo: maxEntries=$maxEntries must be >= 1")

  private final class Holder(build: () => V) {
    lazy val value: V = build()
  }

  private val m = scala.collection.mutable.LinkedHashMap.empty[K, Holder]

  def getOrBuild(key: K)(build: => V): V = {
    val holder = m.synchronized {
      m.get(key) match {
        case Some(h) =>
          m.remove(key); m.update(key, h); h
        case None =>
          if (m.size >= maxEntries) m.remove(m.head._1)
          val h = new Holder(() => build)
          m.update(key, h); h
      }
    }
    try holder.value
    catch {
      case t: Throwable =>
        m.synchronized {
          m.get(key).filter(_ eq holder).foreach(_ => m.remove(key))
        }
        throw t
    }
  }

  /** Test hook: entry count. */
  private[graft] def size: Int = m.synchronized(m.size)
}
