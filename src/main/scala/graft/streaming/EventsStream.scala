package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table.
  *
  * The reference is batch-only (SURVEY.md §2.B: streaming constructs absent);
  * this module is beyond-parity scope. Transformations are written against
  * plain DataFrames so the exact same code runs in batch (q23/q24) and
  * streaming — the Spark-native way to keep both paths consistent.
  */
object EventsStream {

  /** File-stream sources cannot infer schemas, and the testdata generator
    * has shipped `events.ts` under several parquet timestamp encodings
    * across regenerations (nanos, NTZ, micros) — so sniff the footer with a
    * batch read and force EXACTLY the observed schema, normalizing `ts`
    * through the same dispatch the batch reader uses
    * ([[graft.sources.Tables.eventsTsNormalizer]]). One shared dispatch =
    * batch and stream can never disagree about a file's unit (hard-coding
    * nanos here once turned a micros regeneration into events 1000× in the
    * past).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val (schema, normalizeTs) = graft.sources.Tables.eventsStreamSchema(spark, src.toString)
    // The file-stream source requires a directory; the testdata ships single
    // parquet files, so expose the file through a temp dir symlink. A real
    // deployment points this at the ingest drop directory.
    val streamPath =
      if (java.nio.file.Files.isDirectory(src)) src.toString
      else {
        // memoized per source file — repeat readStream calls reuse one
        // symlink dir instead of leaking a temp dir each (Tables.scratchDir)
        val d = java.nio.file.Paths.get(
          graft.sources.Tables.scratchDir("graft-events-stream", src.toString))
        // link to the ABSOLUTE source: a relative `dir` stored verbatim
        // would resolve against the scratch dir — a dangling link that
        // reads zero rows (ensureSymlink's NOFOLLOW check keeps even that
        // mistake from surfacing as FileAlreadyExists on the next call)
        graft.sources.Tables.ensureSymlink(
          d.resolve("events.parquet"), src.toAbsolutePath)
        d.toString
      }
    normalizeTs(
      spark.readStream
        .schema(schema)
        .parquet(streamPath))
  }

  /** Tumbling 1-hour windowed aggregate; the streaming twin of
    * `q23_events_window`. With `withWatermark` the state store evicts windows
    * older than the watermark — bounded state at any input scale.
    */
  def windowedAgg(events: DataFrame, watermark: Boolean = true): DataFrame = {
    val in = if (watermark) events.withWatermark("ts", "2 hours") else events
    in.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // final cast to DOUBLE, exactly Relational's sum2: the twin claim
        // ("the streaming twin of q23_events_window") must include the
        // output schema, and q23 emits v as double, not Decimal(38,2)
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("v"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("v"))
  }

  /** Windowed TRENDING types — the streaming face of the Misra–Gries
    * sketch ([[graft.functions.HeavyHitters]]): per event-time hour, the
    * top-k event types. The sketch is a TypedImperativeAggregate, so
    * streaming state per open window is ONE O(capacity) summary buffer —
    * at a real deployment's cardinality (URLs, search terms) that is the
    * difference between bounded state and a per-key row explosion; the
    * watermark closes and emits windows exactly as [[windowedAgg]]'s.
    * With capacity ≥ distinct keys the summary is exact (the tx_heavy
    * regime) — StreamingSpec's batch-twin comparison is equality, not
    * tolerance; under capacity pressure the classic n/capacity undercount
    * bound applies (HeavyHittersSpec). Top-k is a `slice` of the buffer's
    * deterministic (count desc, key asc) eval order — no streaming sort
    * needed, so the query stays append-compatible.
    */
  def trendingTypes(events: DataFrame, k: Int = 3, capacity: Int = 64,
      watermark: Boolean = true): DataFrame = {
    val in = if (watermark) events.withWatermark("ts", "2 hours") else events
    in.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.HeavyHitters.heavyHitters(col("event_type"), capacity).as("hh"))
      .select(col("w.start").as("h"), explode(slice(col("hh"), 1, k)).as("e"))
      .select(col("h"), col("e.token").as("event_type"), col("e.n").as("n"))
  }

  /** Streaming exact dedup: at-least-once sources re-deliver events; drop
    * repeats by key with a watermark so the seen-keys state is bounded to
    * the watermark horizon (the streaming twin of `dd_exact`).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join: each click joins the same
    * user's views from the preceding `lookback`. Both sides carry
    * watermarks and the join condition bounds event time in BOTH
    * directions, so the state store can evict rows once the watermark
    * passes `c_ts - lookback` — bounded state at any input rate; without
    * the time bounds Spark would have to buffer each side forever. Written
    * against plain DataFrames so the same code is the batch attribution
    * join when fed a batch frame.
    */
  def clickAttribution(events: DataFrame, lookback: String = "10 minutes",
      watermark: Boolean = true): DataFrame = {
    def side(tpe: String, prefix: String) = {
      val s = events.filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"), col("event_id").as(s"${prefix}_id"))
      if (watermark) s.withWatermark(s"${prefix}_ts", "2 hours") else s
    }
    side("click", "c").join(side("view", "v"),
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $lookback"))
      .select(col("c_user").as("user_id"), col("c_id").as("click_id"),
        col("v_id").as("view_id"), col("c_ts"), col("v_ts"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(sessionStart: Long, lastSeen: Long, n: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  case class Scd2State(state: String, validFrom: Long, n: Long)
  case class Scd2Period(user_id: Long, state: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp, n_events: Long)

  /** Streaming SCD2 history — the streaming twin of
    * [[graft.operators.Relational.q49_scd2]]: each user's event feed is a
    * change feed over `event_type`; a period CLOSES (and is emitted, with
    * `valid_to` = the superseding change's ts) the moment an event carries
    * a different state, exactly as the batch islands build assigns
    * `valid_to` = next period's `valid_from`. The open (is_current) period
    * lives only in state — append mode cannot retract, so it is emitted by
    * the batch twin, not the stream. State per user is one small struct
    * (current state, start, count) regardless of history length; like
    * [[sessionize]], per-user event-time order is assumed across batches
    * (the file/ingest sources replay in order; out-of-order feeds need the
    * watermark-sorted shape instead).
    */
  def scd2Stream(events: Dataset[Event]): Dataset[Scd2Period] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[Scd2State]) => {
          // micros, not getTime millis: same-millisecond changes must order
          // and stamp exactly as the batch twin's full-ts sort does
          val sorted = rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
          var cur = state.getOption
          val closed = Seq.newBuilder[Scd2Period]
          sorted.foreach { e =>
            val t = tsMicros(e.ts)
            cur match {
              case Some(c) if c.state == e.event_type =>
                cur = Some(c.copy(n = c.n + 1))
              case Some(c) =>
                closed += Scd2Period(userId, c.state,
                  microsTs(c.validFrom), microsTs(t), c.n)
                cur = Some(Scd2State(e.event_type, t, 1))
              case None =>
                cur = Some(Scd2State(e.event_type, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
        })
  }

  case class TransState(lastType: String, lastTs: Long)
  case class Transition(user_id: Long, from_type: String, to_type: String,
      from_ts: java.sql.Timestamp, to_ts: java.sql.Timestamp)

  /** Timestamp ⇄ epoch-micros without millisecond truncation: `ts.getTime`
    * is millis, and ordering or re-emitting through it silently diverges
    * from the batch twins' full-`ts` sorts on micros corpora (exactly the
    * precision the unit-sniffing [[readStream]] exists to preserve).
    */
  private def tsMicros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def microsTs(us: Long): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Streaming twin of [[graft.operators.Relational.ev_transitions]]'s pair
    * layer: each user's consecutive (event, next event) pairs, emitted AS
    * the next event arrives. Unlike [[scd2Stream]] (which emits only on
    * state CHANGE), every event with a predecessor emits — the raw edge
    * stream a live transition matrix aggregates over (`groupBy(from, to)`
    * in update mode downstream, or foreachBatch into a running store).
    * State per user is one (lastType, lastTs) struct — bounded by user
    * cardinality, independent of event volume. Per-user event-time order
    * across batches is assumed, as in [[sessionize]]/[[scd2Stream]];
    * StreamingSpec pins batch parity: the emitted pairs aggregated by
    * (from, to) equal the batch operator's matrix on identical input.
    */
  def transitionsStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[TransState]) => {
          val sorted = rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            last.foreach { l =>
              out += Transition(userId, l.lastType, e.event_type,
                microsTs(l.lastTs), e.ts)
            }
            last = Some(TransState(e.event_type, tsMicros(e.ts)))
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }

  case class TouchState(lastTouch: String)
  case class Credit(user_id: Long, channel: String, cents: Long,
      ts: java.sql.Timestamp)

  /** Streaming twin of [[graft.operators.Relational.ev_attribution]]'s
    * credit layer: each purchase emits one credit against the user's most
    * recent PRECEDING non-purchase event (or "(none)" for a cold
    * purchase), as the purchase arrives — the live feed a revenue
    * dashboard aggregates by channel (update-mode groupBy or foreachBatch
    * downstream). State per user is ONE last-touch string — bounded by
    * user cardinality, independent of event volume; the batch twin's LOCF
    * window collapses to exactly this state machine because only the
    * latest touch ever matters. Cents are the batch operator's exact
    * quantization (floor(value·100) — same IEEE double op). Per-user
    * event-time order across batches is assumed, as in
    * [[transitionsStream]]; StreamingSpec pins batch parity: credits
    * aggregated by channel equal the batch census on identical input.
    */
  def attributionStream(events: Dataset[Event]): Dataset[Credit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[TouchState]) => {
          val sorted = rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
          var touch = state.getOption
          val out = Seq.newBuilder[Credit]
          sorted.foreach { e =>
            if (e.event_type == "purchase")
              out += Credit(userId, touch.map(_.lastTouch).getOrElse("(none)"),
                math.floor(e.value * 100).toLong, e.ts)
            else touch = Some(TouchState(e.event_type))
          }
          touch.foreach(state.update)
          out.result().iterator
        })
  }

  case class EwmaState(n: Long, first: Long, last: Long, ewma: Long)
  case class EwmaRow(user_id: Long, n_events: Long, first_cents: Long,
      last_cents: Long, ewma_cents: Long)

  /** Streaming twin of [[graft.operators.Relational.ev_ewma]]: the
    * per-user exponentially-smoothed value as a LIVE running metric —
    * each batch emits every touched user's updated row (update-mode
    * sink), the shape a monitoring dashboard reads. The recurrence is
    * the batch operator's exact fixed-point algebra
    * (`(α·x + (10⁶−α)·s) div 10⁶` on floor(value·100) cents, first
    * event seeds the state), so after any batch partitioning of an
    * in-order feed the final row per user is BIT-IDENTICAL to the batch
    * operator on the same events — the spec pins it across a batch
    * boundary. State per user is ONE 4-long struct, bounded by user
    * cardinality; per-user event-time order across batches is assumed,
    * as in [[attributionStream]]/[[transitionsStream]] (within a batch
    * the group sorts by (ts, event_id)).
    */
  def ewmaStream(events: Dataset[Event],
      alphaMillionths: Long = graft.operators.Relational.ewmaAlphaMillionths):
      Dataset[EwmaRow] = {
    require(alphaMillionths >= 1L && alphaMillionths <= 1000000L,
      s"ewmaStream: alphaMillionths=$alphaMillionths must be in [1, 1000000]")
    import events.sparkSession.implicits._
    val a = alphaMillionths
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[EwmaState]) => {
          val sorted = rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(EwmaState(0L, 0L, 0L, 0L))
          sorted.foreach { e =>
            val x = math.floor(e.value * 100).toLong
            st =
              if (st.n == 0L) EwmaState(1L, x, x, x)
              else EwmaState(st.n + 1L, st.first, x,
                (a * x + (1000000L - a) * st.ewma) / 1000000L)
          }
          state.update(st)
          EwmaRow(userId, st.n, st.first, st.last, st.ewma)
        })
  }

  /** Stateful gap-based sessionization (30-min inactivity) via
    * flatMapGroupsWithState — the streaming twin of `q24_sessionize`.
    * State per user is ONE small struct regardless of history (bounded by
    * user cardinality, not event volume).
    *
    * By default a user's open session closes only when a LATER event of
    * theirs arrives past the gap — a user who never returns parks their
    * final session in state forever and it is never emitted (the batch
    * twin emits every session). `closeIdle = true` fixes both: the input
    * gets a 30-minute watermark and each user an event-time timeout at
    * `lastSeen + gap` (clamped monotone past the current watermark — the
    * same running-clock device as `EmbStream.semanticDedupGate`'s TTL);
    * when the watermark passes it, the open session is emitted and the
    * user's state evicted. Off by default only because a watermark
    * changes what inputs are admissible (late events beyond 30 min drop).
    */
  def sessionize(events: Dataset[Event], closeIdle: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = 1800L * 1000000L
    val src = if (closeIdle) events.withWatermark("ts", "30 minutes") else events
    val timeoutConf =
      if (closeIdle) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Session(userId,
              microsTs(st.sessionStart), microsTs(st.lastSeen), st.n))
          } else {
            // micros throughout (state was already micros; feeding it
            // getTime*1000 truncated sub-millisecond digits on micros data)
            val sorted = rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = tsMicros(e.ts)
              cur match {
                case Some(st) if t - st.lastSeen <= gapMicros =>
                  cur = Some(st.copy(lastSeen = t, n = st.n + 1))
                case Some(st) =>
                  closed += Session(userId,
                    microsTs(st.sessionStart), microsTs(st.lastSeen), st.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              if (closeIdle) state.setTimeoutTimestamp(
                StateClock.monotoneTimeoutMs(st.lastSeen / 1000L,
                  gapMicros / 1000L, state.getCurrentWatermarkMs()))
            }
            closed.result().iterator
          }
        })
  }
}
