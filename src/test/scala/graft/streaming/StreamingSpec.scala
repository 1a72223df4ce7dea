package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch twin on the same input") {
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.windowedAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .orderBy("h", "event_type").collect().toSeq
      val batch = EventsStream.windowedAgg(Tables.load(spark, dir, "events"), watermark = false)
        .orderBy("h", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sliding windows run unchanged on a stream: q55's expression equals the batch result") {
    // q55_sliding_window's scaladoc claims the identical groupBy(window(ts,
    // '1 hour', '15 minutes')) expression is stream-ready — pin it
    def slide(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
    val q = slide(EventsStream.readStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("slide_out")
        .orderBy("w_start", "event_type").collect().toSeq
      val batch = graft.operators.Relational.q55_sliding_window(spark, dir)
        .collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("readStream dispatches on the file's ts unit: micros and nanos files yield identical events") {
    // the round-9 regression class: the stream reader hard-coded one parquet
    // timestamp encoding and a testdata regeneration to another shifted every
    // event 1000×. The reader now footer-sniffs and dispatches — pin it by
    // feeding the SAME logical events through two encodings.
    def t(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val logical = Seq(
      (1L, t(3600), 7L, "view", 1.0, "{}"),
      (2L, t(3660), 7L, "click", 2.0, "{}"),
      (3L, t(7300), 8L, "view", 3.0, "{}"))
    val root = java.nio.file.Files.createTempDirectory("graft-ts-unit")
    // micros: a native timestamp column, written as parquet TIMESTAMP
    logical.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$root/micros/events.parquet")
    // nanos: a REAL TIMESTAMP(NANOS) file written via parquet-mr (Spark
    // cannot write the unit) — the footer ANNOTATION matters now: the
    // reader refuses a raw BIGINT ts that merely looks like nanos
    // (TablesSpec pins the rejection), so the simulation must carry the
    // genuine logical type
    locally {
      import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      val schema = Types.buildMessage()
        .addField(Types.required(INT64).named("event_id"))
        .addField(Types.required(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
        .addField(Types.required(INT64).named("user_id"))
        .addField(Types.required(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named("event_type"))
        .addField(Types.required(DOUBLE).named("value"))
        .addField(Types.required(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named("props"))
        .named("events")
      val conf = new org.apache.hadoop.conf.Configuration()
      org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
      val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(s"$root/nanos/events.parquet/part-0.parquet"))
        .withConf(conf).build()
      try logical.foreach { case (id, ts, u, e, v, p) =>
        val g = factory.newGroup()
        g.add("event_id", id); g.add("ts", ts.getTime * 1000000L)
        g.add("user_id", u); g.add("event_type", e)
        g.add("value", v); g.add("props", p)
        w.write(g)
      } finally w.close()
    }
    val outputs = Seq("micros", "nanos").map { unit =>
      val q = EventsStream.readStream(spark, s"$root/$unit")
        .writeStream.outputMode("append")
        .format("memory").queryName(s"unit_$unit").start()
      try {
        q.processAllAvailable()
        spark.table(s"unit_$unit").orderBy("event_id")
          .select("event_id", "ts", "user_id", "event_type", "value")
          .collect().map(_.toSeq).toSeq
      } finally q.stop()
    }
    assert(outputs(0) == outputs(1), "both encodings decode to the same instants")
    assert(outputs(0).map(r => (r(0), r(1))) ==
      logical.map(e => (e._1, e._2)), "instants match the source rows exactly")
    // and batch agrees with stream on both encodings
    Seq("micros", "nanos").zip(outputs).foreach { case (unit, streamed) =>
      val batch = Tables.load(spark, s"$root/$unit", "events")
        .orderBy("event_id")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect().map(_.toSeq).toSeq
      assert(batch == streamed, s"batch/stream parity on $unit")
    }
    // an unrecognized ts type must fail loud, not guess a unit
    val e = intercept[IllegalArgumentException] {
      Tables.eventsTsNormalizer(org.apache.spark.sql.types.StringType)
    }
    assert(e.getMessage.contains("refusing to guess"))
  }

  test("stream-stream interval join: click attributes in-lookback views, batch-parity") {
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.clickAttribution(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .orderBy("click_id", "view_id").collect().toSeq
      val batch = EventsStream.clickAttribution(
          Tables.load(spark, dir, "events"), watermark = false)
        .orderBy("click_id", "view_id").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // every attributed view is within the lookback, never after the click
      spark.table("attr_out").collect().foreach { r =>
        val c = r.getTimestamp(3).getTime
        val v = r.getTimestamp(4).getTime
        assert(v <= c && v >= c - 10 * 60 * 1000)
      }
    } finally q.stop()
  }

  test("stateful sessionization: gap splits sessions, in-gap events extend them") {
    val input = MemoryStream[EventsStream.Event](spark)
    def ev(id: Long, user: Long, sec: Long) =
      EventsStream.Event(id, new java.sql.Timestamp(sec * 1000L), user, "view", 1.0)
    val q = EventsStream.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // session 1: two events 10 min apart; then a 31-min gap opens session 2
      input.addData(ev(1, 7L, 0), ev(2, 7L, 600))
      q.processAllAvailable()
      input.addData(ev(3, 7L, 600 + 1860))
      q.processAllAvailable()
      // closing session 2 requires a further gap
      input.addData(ev(4, 7L, 600 + 1860 + 3600))
      q.processAllAvailable()
      val out = spark.table("sess_out").orderBy("session_start")
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      assert(out.toSeq == Seq((7L, 2L), (7L, 1L)))
    } finally q.stop()
  }

  test("sessionize closeIdle: watermark alone closes a quiet user's open session") {
    val input = MemoryStream[EventsStream.Event](spark)
    // base offset keeps ts clear of epoch 0 — a row AT the initial
    // watermark (0) is culled by the event-time late filter
    def ev(id: Long, user: Long, sec: Long) =
      EventsStream.Event(id, new java.sql.Timestamp((86400 + sec) * 1000L), user, "view", 1.0)
    val q = EventsStream.sessionize(input.toDS(), closeIdle = true)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_idle_out").start()
    try {
      // user 7 goes quiet after two events; only OTHER-user traffic follows
      input.addData(ev(1, 7L, 0), ev(2, 7L, 600))
      q.processAllAvailable()
      // user 8 advances the watermark past 600 + gap(1800) + delay(1800)
      input.addData(ev(3, 8L, 600 + 1800 + 1800 + 60))
      q.processAllAvailable()
      // timeouts fire on the batch AFTER the watermark update
      input.addData(ev(4, 8L, 600 + 1800 + 1800 + 120))
      q.processAllAvailable()
      val out = spark.table("sess_idle_out")
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      assert(out.toSeq.contains((7L, 2L)),
        s"user 7's open session should close on watermark alone: ${out.toSeq}")
    } finally q.stop()
  }

  test("scd2Stream: closed periods match the batch twin; open period stays in state") {
    val input = MemoryStream[EventsStream.Event](spark)
    def ev(id: Long, user: Long, sec: Long, st: String) =
      EventsStream.Event(id, new java.sql.Timestamp(sec * 1000L), user, st, 1.0)
    // user 7: A,A,B,A (A-period closes at B's ts, B-period at the return to
    // A, final A stays open); user 9: C only (never closes)
    val batch1 = Seq(ev(1, 7, 0, "A"), ev(2, 7, 60, "A"), ev(3, 7, 120, "B"))
    val batch2 = Seq(ev(4, 7, 180, "A"), ev(5, 9, 0, "C"))
    val q = EventsStream.scd2Stream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_out").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("scd2_out")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSeq.sorted
      // batch twin on the identical rows: closed periods = NOT is_current
      val dir = java.nio.file.Files.createTempDirectory("graftscd2").toString
      import spark.implicits._
      (batch1 ++ batch2).map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val batch = graft.operators.Relational.q49_scd2(spark, dir)
        .filter(!org.apache.spark.sql.functions.col("is_current"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2), r.getTimestamp(3), r.getLong(5))).toSeq.sorted
      assert(streamed == batch)
      assert(streamed.map(t => (t._1, t._2, t._5)) == Seq((7L, "A", 2L), (7L, "B", 1L)))
    } finally q.stop()
  }

  test("transitionsStream: emitted pairs aggregate to the batch transition matrix") {
    val input = MemoryStream[EventsStream.Event](spark)
    def ev(id: Long, user: Long, sec: Long, st: String) =
      EventsStream.Event(id, new java.sql.Timestamp(sec * 1000L), user, st, 1.0)
    // user 7: A->A->B->A crosses the batch boundary (the A->B edge's A and
    // the B->A edge's B live in different batches — state carries the
    // predecessor); user 9 has a single event and must emit nothing
    val batch1 = Seq(ev(1, 7, 0, "A"), ev(2, 7, 60, "A"))
    val batch2 = Seq(ev(3, 7, 120, "B"), ev(4, 7, 180, "A"), ev(5, 9, 0, "C"))
    val q = EventsStream.transitionsStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_out").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("trans_out")
        .groupBy("from_type", "to_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
      // batch twin on the identical rows
      val dir = java.nio.file.Files.createTempDirectory("grafttrans").toString
      import spark.implicits._
      (batch1 ++ batch2).map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val batch = graft.operators.Relational.ev_transitions(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
      assert(streamed == batch)
      assert(streamed == Seq(("A", "A", 1L), ("A", "B", 1L), ("B", "A", 1L)))
    } finally q.stop()
  }

  test("attributionStream: credits aggregate to the batch ev_attribution census; touch state crosses batches") {
    val input = MemoryStream[EventsStream.Event](spark)
    def ev(id: Long, user: Long, sec: Long, st: String, v: Double) =
      EventsStream.Event(id, new java.sql.Timestamp(sec * 1000L), user, st, v)
    // user 7's click lands in batch 1, BOTH purchases in batch 2 — the
    // last-touch state must carry across the batch boundary; user 9's cold
    // purchase credits "(none)"
    val batch1 = Seq(ev(1, 7, 0, "view", 1.0), ev(2, 7, 60, "click", 2.0))
    val batch2 = Seq(ev(3, 7, 120, "purchase", 3.50), ev(4, 7, 180, "purchase", 1.25),
      ev(5, 9, 0, "purchase", 9.99))
    val q = EventsStream.attributionStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .groupBy("channel")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_purchases"),
          org.apache.spark.sql.functions.sum("cents").as("cents_sum"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      val dir = java.nio.file.Files.createTempDirectory("graftattr").toString
      import spark.implicits._
      (batch1 ++ batch2).map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val batch = graft.operators.Relational.ev_attribution(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      assert(streamed == batch)
      assert(streamed == Seq(("(none)", 1L, 999L), ("click", 2L, 475L)))
    } finally q.stop()
  }

  test("transitionsStream orders same-millisecond events by their microseconds, like the batch twin") {
    // regression pin for the getTime-millis truncation: e1 at 100us,
    // e2 at 900us in the SAME millisecond, with event_ids that would sort
    // them in the WRONG order under a millis-truncated key
    def tUs(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(0, us * 1000L))
    val input = MemoryStream[EventsStream.Event](spark)
    val q = EventsStream.transitionsStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_us_out").start()
    try {
      input.addData(
        EventsStream.Event(9, tUs(100), 7, "first", 1.0),
        EventsStream.Event(1, tUs(900), 7, "second", 1.0))
      q.processAllAvailable()
      val edges = spark.table("trans_us_out")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      assert(edges == Seq(("first", "second")))
      // and the emitted from_ts keeps its microseconds
      val fromTs = spark.table("trans_us_out").collect().head.getTimestamp(3)
      assert(fromTs == tUs(100))
    } finally q.stop()
  }

  test("ewmaStream: running per-user EWMA crosses batches; final rows bit-equal the batch ev_ewma") {
    val input = MemoryStream[EventsStream.Event](spark)
    def ev(id: Long, user: Long, sec: Long, v: Double) =
      EventsStream.Event(id, new java.sql.Timestamp(sec * 1000L), user, "view", v)
    // user 7's series splits across the batch boundary — the smoothed
    // state must carry; user 9 is single-event (ewma == first == last)
    val batch1 = Seq(ev(1, 7, 0, 1.00), ev(2, 7, 60, 2.00))
    val batch2 = Seq(ev(3, 7, 120, 10.00), ev(4, 9, 0, 9.99))
    val q = EventsStream.ewmaStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("ewma_out").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // update mode appends each batch's refreshed rows — the live row
      // per user is the one with the highest event count
      val streamed = spark.table("ewma_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
      val dir = java.nio.file.Files.createTempDirectory("graftewma").toString
      import spark.implicits._
      (batch1 ++ batch2).map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val batch = graft.operators.Relational.ev_ewma(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(streamed == batch,
        s"stream final rows $streamed must equal batch $batch")
      // hand check: user 7 = fold(100, 200, 1000) at alpha 0.3:
      // s1=100, s2=(0.3*200+0.7*100)=130, s3=(0.3*1000+0.7*130)=391
      assert(batch.contains((7L, 3L, 100L, 1000L, 391L)))
      assert(batch.contains((9L, 1L, 999L, 999L, 999L)))
    } finally q.stop()
  }

  test("trendingTypes: windowed Misra-Gries top-k on the stream equals the batch twin") {
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.trendingTypes(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("trend_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("trend_out")
        .orderBy("h", "event_type").collect().toSeq
      val batch = EventsStream.trendingTypes(
        Tables.load(spark, dir, "events"), watermark = false)
        .orderBy("h", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // capacity >= distinct types: counts are exact — cross-check one
      // window against a plain count
      val h0 = streamed.head.getAs[java.sql.Timestamp]("h")
      val et0 = streamed.head.getAs[String]("event_type")
      val exact = Tables.load(spark, dir, "events")
        .filter(date_trunc("hour", col("ts")) === h0 && col("event_type") === et0)
        .count()
      assert(streamed.head.getAs[Long]("n") == exact)
    } finally q.stop()
  }

  test("streaming dedup drops redelivered events within the watermark") {
    val input = MemoryStream[EventsStream.Event](spark)
    def ev(id: Long, sec: Long) =
      EventsStream.Event(id, new java.sql.Timestamp(sec * 1000L), 1L, "view", 1.0)
    val q = EventsStream.dedupStream(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(ev(1, 10), ev(2, 20), ev(1, 10)) // in-batch dup
      q.processAllAvailable()
      input.addData(ev(2, 20), ev(3, 30)) // cross-batch redelivery
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming near-dup screen: stream-static band join flags planted dup, batch-parity") {
    val corpus = Seq(
      (100L, "spark catalyst optimizer rewrites logical plans into physical plans with codegen"),
      (101L, "completely different words about zebras and quarks and lattices and embers"))
      .toDF("doc_id", "text")
    val index = DocsStream.bandIndex(corpus)
    val input = MemoryStream[(Long, String)](spark)
    val q = DocsStream.nearDupScreen(
      input.toDS().toDF("doc_id", "text"), index, threshold = 0.3)
      .writeStream.outputMode("append")
      .format("memory").queryName("screen_out").start()
    try {
      input.addData(
        (1L, "spark catalyst optimizer rewrites logical plans into physical plans with whole codegen"),
        (2L, "nothing in common with any corpus document at all here"))
      q.processAllAvailable()
      val hits = spark.table("screen_out")
        .select("in_doc", "corpus_doc").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits == Set((1L, 100L)))
      // the same function over the same data as a plain batch frame agrees
      val batchHits = DocsStream.nearDupScreen(
        Seq((1L, "spark catalyst optimizer rewrites logical plans into physical plans with whole codegen"),
          (2L, "nothing in common with any corpus document at all here")).toDF("doc_id", "text"),
        index, threshold = 0.3)
        .select("in_doc", "corpus_doc").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchHits == hits)
    } finally q.stop()
  }

  test("storeDedupGate: stream-static digest join against the persisted signature store") {
    // store built by the batch job over a base corpus (doc_id mod 5 != 4)
    val dir = java.nio.file.Files.createTempDirectory("graftstoredocs").toString
    Seq((1L, "alpha beta gamma delta", "en", "s", 1L),
      (2L, "spark catalyst optimizer rewrites plans", "en", "s", 1L),
      (6L, "alpha beta gamma delta", "en", "s", 1L)) // same digest as 1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val store = java.nio.file.Files.createTempDirectory("graftstoresig").toString
    graft.operators.Dedup.writeCorpusSignatures(spark, dir, store)
    val input = MemoryStream[(Long, String)](spark)
    val q = DocsStream.storeDedupGate(input.toDS().toDF("doc_id", "text"), spark, store)
      .writeStream.outputMode("append")
      .format("memory").queryName("store_gate_out").start()
    try {
      input.addData(
        (10L, "alpha beta gamma delta"),                 // exact dup → match 1 (min of {1,6})
        (11L, "spark catalyst optimizer rewrites plans"), // exact dup → match 2
        (12L, "never seen content entirely new here"))    // unseen
      q.processAllAvailable()
      val out = spark.table("store_gate_out").collect()
        .map(r => r.getLong(0) -> ((r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
      assert(out(10L) == (("exact_dup", 1L)))
      assert(out(11L) == (("exact_dup", 2L)))
      assert(out(12L) == (("unseen", -1L)))
      // the default path above ran the broadcast-Bloom screen (the store
      // carries the sidecar) — the unscreened join must agree exactly
      val input2 = MemoryStream[(Long, String)](spark)
      val q2 = DocsStream.storeDedupGate(input2.toDS().toDF("doc_id", "text"),
          spark, store, useBloom = false)
        .writeStream.outputMode("append")
        .format("memory").queryName("store_gate_nobloom").start()
      try {
        input2.addData(
          (10L, "alpha beta gamma delta"),
          (11L, "spark catalyst optimizer rewrites plans"),
          (12L, "never seen content entirely new here"))
        q2.processAllAvailable()
        val out2 = spark.table("store_gate_nobloom").collect()
          .map(r => r.getLong(0) -> ((r.getString(2),
            if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
        assert(out2 == out)
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming curation gate: quality filter + digest + split agree with the batch twin") {
    val pass = (Seq("the", "a", "of") ++ (1 to 20).map(i => s"word$i")).mkString(" ")
    val fail = "way too short"
    val input = MemoryStream[(Long, String)](spark)
    val q = DocsStream.curationGate(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    try {
      input.addData((1L, pass), (2L, fail))
      q.processAllAvailable()
      val streamed = spark.table("gate_out")
        .select("doc_id", "digest", "split").collect().map(_.toSeq).toSet
      val batch = DocsStream.curationGate(
        Seq((1L, pass), (2L, fail)).toDF("doc_id", "text"))
        .select("doc_id", "digest", "split").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.map(_.head) == Set(1L))
    } finally q.stop()
  }

  test("mixtureGate: stream admits exactly the batch sampler's keep set; unknown source dropped") {
    // batch census over the real corpus sets the per-source thresholds
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.loadParallel(spark, dir, "documents")
    val rates = graft.operators.Curation.mixtureThresholds(docs)
    val input = MemoryStream[(String, Long, String)](spark)
    val q = DocsStream.mixtureGate(
        input.toDS().toDF("source", "doc_id", "text"), rates)
      .writeStream.outputMode("append")
      .format("memory").queryName("mix_out").start()
    try {
      val rows = docs.select("source", "doc_id", "text").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      input.addData(rows.toSeq: _*)
      input.addData(("srcUNKNOWN", 99999L, "no threshold for me"))
      q.processAllAvailable()
      val streamed = spark.table("mix_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // the batch keep set, from the same thresholds
      val batch = docs
        .withColumn("p6", substring(md5(col("text")), 1, 6))
        .join(rates, Seq("source"))
        .filter(col("p6") < col("thr"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(!streamed.contains(99999L), "allow-list: unknown source must drop")
      // and the admitted counts agree with samp_mixture's per-source audit
      val audit = graft.operators.Curation.samp_mixture(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val bySource = spark.table("mix_out").groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      audit.foreach { case (src, kept) =>
        assert(bySource.getOrElse(src, 0L) == kept, s"source $src")
      }
    } finally q.stop()
  }

  test("vec_dot available from SQL via install and via extensions class") {
    graft.functions.GraftFunctions.install(spark)
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val d = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").collect().head.getDouble(0)
    assert(d == 32.0)
    // SQL exposure demands type validation: getFloat over array<double>
    // would silently reinterpret packed bytes — must fail analysis instead
    val te = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").collect()
    }
    assert(te.getMessage.contains("array<float>"), te.getMessage)
    // dims mismatch fails LOUD (the VecNearest/EmbStream.cosine contract),
    // never a silent prefix product
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f))).toDF("a", "b")
      .createOrReplaceTempView("vecs_bad")
    val de = intercept[Exception] {
      spark.sql("SELECT vec_dot(a, b) FROM vecs_bad").collect()
    }
    assert(de.getMessage.contains("dims mismatch") ||
      Option(de.getCause).exists(_.getMessage.contains("dims mismatch")), de.getMessage)
  }

  test("ingestDedup: same-content docs within the horizon collapse to the first") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val stream = input.toDF().toDF("doc_id", "ingest_ts", "text")
    val q = DocsStream.ingestDedup(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      // batch 1: two distinct texts + one near-instant duplicate (normalized
      // equal: punctuation/case differ only)
      input.addData(
        (1L, t(0), "spark scan join"),
        (2L, t(1), "Spark SCAN join!"),
        (3L, t(2), "window sort merge"))
      q.processAllAvailable()
      // batch 2: duplicate arriving 60s later — still inside the 10m horizon
      input.addData((4L, t(60), "spark scan join"))
      q.processAllAvailable()
      val admitted = spark.table("dedup_out").select("doc_id")
        .as[Long].collect().toSet
      // exactly one of the same-batch duplicate pair (which one wins the
      // state-store race within a batch is not defined), plus the distinct
      // doc; the cross-batch duplicate (doc 4) must be rejected
      assert(admitted.contains(3L) && !admitted.contains(4L))
      assert((admitted & Set(1L, 2L)).size == 1 && admitted.size == 2)
      // admitted digest set matches the batch twin's distinct digests
      val batchDigests = Seq(
        (1L, t(0), "spark scan join"), (2L, t(1), "Spark SCAN join!"),
        (3L, t(2), "window sort merge"), (4L, t(60), "spark scan join"))
        .toDF("doc_id", "ingest_ts", "text")
        .select(md5(graft.functions.TextFunctions.normalize(col("text"))).as("digest"))
        .distinct().as[String].collect().toSet
      val admittedDigests = spark.table("dedup_out").select("digest")
        .as[String].collect().toSet
      assert(admittedDigests == batchDigests)
    } finally q.stop()
  }

  test("quotaGate: per-source admission cap holds across batches; order deterministic") {
    val input = MemoryStream[(String, Long, String)](spark)
    val q = DocsStream.quotaGate(input.toDS(), quota = 2)
      .toDF("source", "doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_out").start()
    try {
      input.addData(("a", 3L, "t"), ("a", 1L, "t"), ("b", 10L, "t"))
      q.processAllAvailable()
      // batch 2: source a is already at quota 2 after admitting {1,3}
      input.addData(("a", 2L, "t"), ("b", 11L, "t"), ("b", 12L, "t"))
      q.processAllAvailable()
      val got = spark.table("quota_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(got == Set("a" -> 1L, "a" -> 3L, "b" -> 10L, "b" -> 11L),
        s"got $got")
    } finally q.stop()
    // a quota beyond Int.MaxValue must admit everything, not wrap negative
    val big = MemoryStream[(String, Long, String)](spark)
    val q2 = DocsStream.quotaGate(big.toDS(), quota = 3000000000L)
      .toDF("source", "doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_big").start()
    try {
      big.addData(("a", 1L, "t"), ("a", 2L, "t"))
      q2.processAllAvailable()
      assert(spark.table("quota_big").count() == 2)
    } finally q2.stop()
  }

  test("quotaGate admission is heap-bounded: a 10^5-row flood admits exactly `room` without materializing the batch") {
    // the ids arrive through a LAZY one-shot iterator (no backing
    // collection, worst-first order so the heap churns); selecting the
    // `room` smallest must consume it streaming — the previous
    // toSeq.sortBy buffered the whole batch on one task
    var produced = 0L
    val ids = Iterator.range(0, 100000).map { i => produced += 1; 99999L - i }
    val got = DocsStream.admitSmallest(ids, room = 10)
    assert(produced == 100000L, "iterator fully consumed (state must count the whole batch)")
    assert(got == (0L until 10L), s"the 10 smallest ids, ascending: $got")
    // room >= batch admits everything
    assert(DocsStream.admitSmallest(Iterator(5L, 3L, 9L), room = 100L) == Seq(3L, 5L, 9L))
    // a >2^31 room clamps instead of wrapping negative
    assert(DocsStream.admitSmallest(Iterator(1L, 2L), room = 3000000000L) == Seq(1L, 2L))
  }

  test("PQ encoding is stream-ready: encodePq columns produce batch-identical codes on a stream") {
    // the encoder is pure column algebra over plan-literal codebooks, so the
    // EXACT batch definition drops into readStream unchanged — the property
    // that lets a 100 TB ingest pipeline quantize embeddings on arrival
    val e = graft.sources.Tables.loadParallel(spark, dir, "embeddings")
    val books = graft.operators.Clustering.pqTrain(e, m = 8, k = 8, iters = 1, sub = 8)
    val batch = graft.operators.Clustering.encodePq(e, books, sub = 8)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val stream = graft.operators.Clustering.encodePq(
      input.toDF().toDF("vec_id", "embedding"), books, sub = 8)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("pq_out").start()
    try {
      input.addData(e.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1))).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("pq_out").orderBy("vec_id")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("misra_gries available from SQL via install") {
    graft.functions.GraftFunctions.install(spark)
    Seq("a", "a", "b").toDF("token").createOrReplaceTempView("toks")
    val top = spark.sql(
      "SELECT misra_gries(token, 4)[0].token AS t FROM toks")
      .collect().head.getString(0)
    assert(top == "a")
  }

  test("enforceRequired filters rows with NULL required columns (A13)") {
    val e = new graft.engine.Engine(spark)
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("z")))
      .toDF("id", "v")
    assert(e.enforceRequired(df, Seq("v")).count() == 2)
    assert(e.enforceRequired(df, Seq("not_a_col")).count() == 3)
  }

  test("EmbStream.semanticDedupGate: cross-batch cell state, capped-state loss is flagged") {
    import graft.streaming.EmbStream
    val cents = Seq(Seq(10.0, 0.0), Seq(-10.0, 0.0)) // two cells by x sign
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val stream = input.toDF().toDF("vec_id", "embedding")
    val q = EmbStream.semanticDedupGate(stream, cents, threshold = 0.95, stateCap = 2)
      .writeStream.outputMode("append").format("memory").queryName("emb_gate").start()
    try {
      // batch 1: v1 admitted (cell 0); v2 is its near-parallel — refused
      // WITHIN the same batch (vec_id order); v3 lands in the other cell
      input.addData((1L, Seq(1f, 0f)), (2L, Seq(2f, 0.01f)), (3L, Seq(-1f, 0f)))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate of v1 — cell state survived
      input.addData((4L, Seq(3f, 0f)))
      q.processAllAvailable()
      // batch 3: v5 is same-cell but dissimilar — admitted, filling the cap
      input.addData((5L, Seq(0.5f, 5f)))
      q.processAllAvailable()
      // batch 4 at cap: v6 duplicates v5 (still caught — the cap affects
      // RECORDING, not checking); v7 is new — admitted but NOT recorded,
      // and both decisions carry state_full
      input.addData((6L, Seq(0.4f, 6f)), (7L, Seq(5f, -5f)))
      q.processAllAvailable()
      // batch 5: v8 duplicates the unrecorded v7 — the documented recall
      // loss: admitted, but visibly under state_full, never silently
      input.addData((8L, Seq(6f, -6f)))
      q.processAllAvailable()
      val got = spark.table("emb_gate")
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
            r.getBoolean(5)))).toMap
      assert(got(1L) == ((0, true, None, false)))
      assert(got(2L) == ((0, false, Some(1L), false)))
      assert(got(3L) == ((1, true, None, false)))
      assert(got(4L) == ((0, false, Some(1L), false)))
      assert(got(5L) == ((0, true, None, false)))
      assert(got(6L)._2 == false && got(6L)._3 == Some(5L) && got(6L)._4 == true)
      assert(got(7L) == ((0, true, None, true)))
      assert(got(8L) == ((0, true, None, true)))
    } finally q.stop()
  }

  test("EmbStream.diversityGate: hand-computed doubling trace — cross-batch state, radius seed + cascaded doubling, merge-away, shard isolation") {
    import graft.streaming.EmbStream
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = EmbStream.diversityGate(input.toDF().toDF("vec_id", "embedding"),
        kPerShard = 2, shards = 4)
      .writeStream.outputMode("append").format("memory").queryName("div_gate").start()
    try {
      // shard 0 (ids ≡ 0 mod 4), 1-D points. Hand trace at kPerShard=2:
      //  id0  x=0  → admit, centers {0}, r2=0
      //  id4  x=10 → d²=100 > 0 → admit, centers {0,10}, r2=0
      //  id8  x=1  → d²=1 > 0 → admit → overflow → r2 seeds to the min
      //              pairwise d² (1) → merge drops id8 itself (d²=1 ≤ 1
      //              to id0) → centers {0,10}, r2=1 (admitted, merged away)
      // shard 1 (ids ≡ 1): an independent sketch — both points admitted at r2=0
      input.addData((0L, Seq(0f)), (4L, Seq(10f)), (8L, Seq(1f)),
        (1L, Seq(0f)), (5L, Seq(10f)))
      q.processAllAvailable()
      // batch 2 — state survived: id12 x=0.5 is covered (d²=0.25 ≤ 1);
      // id16 x=5 admits then CASCADES the doubling: r2 1→4→16 never frees
      // a slot (25 > 4, 25 > 16 vs id0... and 100 > both), r2=64 finally
      // merges id16 away (25 ≤ 64) → centers {0,10}, r2=64
      input.addData((12L, Seq(0.5f)), (16L, Seq(5f)))
      q.processAllAvailable()
      // batch 3: x=7 is covered at the widened radius (49 ≤ 64)
      input.addData((20L, Seq(7f)))
      q.processAllAvailable()
      val got = spark.table("div_gate").collect().map(r =>
        r.getLong(0) -> ((r.getInt(1), r.getBoolean(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getDouble(5), r.getInt(6), r.getBoolean(7)))).toMap
      assert(got(0L) == ((0, true, None, None, 0.0, 1, true)))
      assert(got(4L) == ((0, true, None, None, 0.0, 2, true)))
      // ids 8 and 16: admitted (uncovered at the old radius) but merged
      // straight back out by their own doubling cascade → retained=false
      assert(got(8L) == ((0, true, None, None, 1.0, 2, false)))
      assert(got(1L) == ((1, true, None, None, 0.0, 1, true)))
      assert(got(5L) == ((1, true, None, None, 0.0, 2, true)))
      assert(got(12L) == ((0, false, Some(0L), Some(0.25), 1.0, 2, false)))
      assert(got(16L) == ((0, true, None, None, 64.0, 2, false)))
      assert(got(20L) == ((0, false, Some(0L), Some(49.0), 64.0, 2, false)))
    } finally q.stop()
  }

  test("EmbStream.diversityGate invariants on the corpus: bounded sketch, covered refusals, monotone radius") {
    import graft.streaming.EmbStream
    val vecs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = EmbStream.diversityGate(input.toDF().toDF("vec_id", "embedding"),
        kPerShard = 4, shards = 4)
      .writeStream.outputMode("append").format("memory").queryName("div_inv").start()
    try {
      input.addData(vecs.toSeq)
      q.processAllAvailable()
      val rows = spark.table("div_inv").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getBoolean(2),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getDouble(5), r.getInt(6), r.getBoolean(7)))
      assert(rows.length == vecs.length)
      assert(rows.forall(_._6 <= 4), "the sketch is hard-bounded at kPerShard")
      assert(rows.filter(!_._3).forall(r => r._4.get <= r._5),
        "every refusal's witness sits within the current radius")
      assert(rows.filter(_._3).forall(_._4.isEmpty))
      assert(rows.filter(_._7).forall(_._3),
        "retained implies admitted — refusals never enter the sketch")
      // radius is non-decreasing along each shard's vec_id order
      rows.groupBy(_._2).foreach { case (_, rs) =>
        val radii = rs.sortBy(_._1).map(_._5)
        assert(radii.zip(radii.tail).forall { case (a, b) => a <= b },
          "the doubling radius must never shrink")
      }
      // the gate discriminates on real data: some admitted, some refused
      assert(rows.exists(_._3) && rows.exists(!_._3))
    } finally q.stop()
  }

  test("EmbStream.semanticDedupGate: greedy keeper set on chains — refusals always have a KEPT witness") {
    import graft.streaming.EmbStream
    // chain: v1 ≈ v2, v2 ≈ v3, v1 !≈ v3 (rotating unit-ish vectors). The
    // batch audit would flag v2 AND v3 (any lower-id member); the online
    // gate refuses v2 (witness v1, kept) but must ADMIT v3 — its only
    // near neighbor v2 was refused and never entered state. This is the
    // documented divergence, pinned so it can't drift silently.
    val cents = Seq(Seq(10.0, 0.0))
    val v1 = Seq(1f, 0f)
    val v2 = Seq(math.cos(0.6).toFloat, math.sin(0.6).toFloat)  // cos≈0.825 to v1
    val v3 = Seq(math.cos(1.2).toFloat, math.sin(1.2).toFloat)  // cos≈0.825 to v2, 0.36 to v1
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = EmbStream.semanticDedupGate(input.toDF().toDF("vec_id", "embedding"),
        cents, threshold = 0.8, stateCap = 100)
      .writeStream.outputMode("append").format("memory").queryName("emb_chain").start()
    try {
      input.addData((1L, v1), (2L, v2), (3L, v3))
      q.processAllAvailable()
      val got = spark.table("emb_chain").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
      assert(got(1L) == ((true, None)))
      assert(got(2L) == ((false, Some(1L))), "v2's witness v1 is kept")
      assert(got(3L) == ((true, None)), "v3 admitted: its only near neighbor was refused")
    } finally q.stop()
  }

  test("EmbStream.semanticDedupGate TTL: idle cells expire, a post-expiry near-dup is re-admitted") {
    import graft.streaming.EmbStream
    val cents = Seq(Seq(10.0, 0.0), Seq(0.0, 10.0))
    val v = Seq(1f, 0.05f) // cell 0
    val other = Seq(0.05f, 1f) // cell 1 — its arrivals advance the watermark
    // epoch-offset base: a t=0 event ties the INITIAL watermark and is
    // dropped as late before the gate ever sees it
    def t(s: Long) = new java.sql.Timestamp((100 + s) * 1000)
    val input = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])](spark)
    val stream = input.toDF().toDF("vec_id", "event_time", "embedding")
      .withWatermark("event_time", "0 seconds")
    val q = EmbStream.semanticDedupGate(stream, cents, threshold = 0.9,
        stateTtlMs = Some(10000L))
      .writeStream.outputMode("append").format("memory").queryName("emb_ttl").start()
    try {
      input.addData((1L, t(0), v))
      q.processAllAvailable()
      // within the TTL: the cross-batch duplicate is still refused
      input.addData((2L, t(5), v))
      q.processAllAvailable()
      // watermark advances far past cell 0's timeout (15 s) via cell 1
      // traffic; the timeout fires on the NEXT trigger after the advance
      input.addData((3L, t(60), other))
      q.processAllAvailable()
      input.addData((4L, t(61), other))
      q.processAllAvailable()
      // cell 0's state expired: the same content is RE-ADMITTED — the
      // documented TTL trade, visible as a second admitted=true row
      input.addData((5L, t(62), v))
      q.processAllAvailable()
      val got = spark.table("emb_ttl").collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
      assert(got(1L) == ((true, None)))
      assert(got(2L) == ((false, Some(1L))), "pre-expiry duplicate still refused")
      assert(got(3L) == ((true, None)))
      assert(got(4L) == ((false, Some(3L))), "active cell never expires mid-flow")
      assert(got(5L) == ((true, None)), "post-expiry duplicate re-admitted")
    } finally q.stop()
  }

  test("quotaGateExpiring: an idle source's quota window resets after the TTL") {
    val input = MemoryStream[(String, Long, String, java.sql.Timestamp)](spark)
    def t(s: Long) = new java.sql.Timestamp((100 + s) * 1000)
    val docs = input.toDS()
      .withWatermark("_4", "0 seconds")
      .as[(String, Long, String, java.sql.Timestamp)]
    val q = DocsStream.quotaGateExpiring(docs, quota = 2, ttlMs = 10000L)
      .toDF("source", "doc_id")
      .writeStream.outputMode("append").format("memory").queryName("quota_ttl").start()
    try {
      // burst 1: a admits its 2 smallest, then saturates
      input.addData(("a", 3L, "t", t(0)), ("a", 1L, "t", t(0)), ("a", 2L, "t", t(0)))
      q.processAllAvailable()
      input.addData(("a", 4L, "t", t(5)))
      q.processAllAvailable()
      // other-source traffic advances the watermark past a's timeout (15 s)
      input.addData(("b", 10L, "t", t(60)))
      q.processAllAvailable()
      input.addData(("b", 11L, "t", t(61)))
      q.processAllAvailable()
      // burst 2: a's state expired — its quota window reset, fresh docs admitted
      input.addData(("a", 20L, "t", t(62)), ("a", 21L, "t", t(62)), ("a", 22L, "t", t(62)))
      q.processAllAvailable()
      val got = spark.table("quota_ttl").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(got == Set("a" -> 1L, "a" -> 2L, "b" -> 10L, "b" -> 11L,
        "a" -> 20L, "a" -> 21L), s"got $got")
    } finally q.stop()
  }

  test("TTL timeouts are monotone: a late-but-valid batch never shortens a prior expiry") {
    // the regression: keying the timeout off the CURRENT batch's max event
    // time alone lets a straggler (valid under a long watermark delay)
    // rewrite a later expiry to an earlier one, dropping state before ttl
    // has elapsed since the group's true latest arrival. State now carries
    // the running max, so expiry keys off the latest arrival EVER.
    import graft.streaming.EmbStream
    val cents = Seq(Seq(10.0, 0.0), Seq(0.0, 10.0))
    val v = Seq(1f, 0.05f) // cell 0
    val other = Seq(0.05f, 1f) // cell 1
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val input = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])](spark)
    val stream = input.toDF().toDF("vec_id", "event_time", "embedding")
      .withWatermark("event_time", "50 seconds")
    val q = EmbStream.semanticDedupGate(stream, cents, threshold = 0.9,
        stateTtlMs = Some(10000L))
      .writeStream.outputMode("append").format("memory").queryName("emb_mono").start()
    try {
      input.addData((1L, t(1000), v)) // cell 0: seen=1000, expiry 1010
      q.processAllAvailable()
      // straggler at t=960: valid (wm=950) — must NOT pull expiry to 970
      input.addData((2L, t(960), v))
      q.processAllAvailable()
      // cell-1 traffic pushes the watermark to 975/976 — past the buggy
      // 970 expiry, still short of the correct 1010
      input.addData((3L, t(1025), other))
      q.processAllAvailable()
      input.addData((4L, t(1026), other))
      q.processAllAvailable()
      // cell 0's state must still be alive: a near-dup of v1 is refused
      input.addData((5L, t(1020), v))
      q.processAllAvailable()
      val got = spark.table("emb_mono").collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(!got(2L), "straggler near-dup refused against live state")
      assert(!got(5L), "state survived: expiry keyed off t=1000, not the straggler")
    } finally q.stop()
  }

  test("quotaGateExpiring timeout is monotone under stragglers too") {
    val input = MemoryStream[(String, Long, String, java.sql.Timestamp)](spark)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val docs = input.toDS()
      .withWatermark("_4", "50 seconds")
      .as[(String, Long, String, java.sql.Timestamp)]
    val q = DocsStream.quotaGateExpiring(docs, quota = 1, ttlMs = 10000L)
      .toDF("source", "doc_id")
      .writeStream.outputMode("append").format("memory").queryName("quota_mono").start()
    try {
      input.addData(("a", 1L, "t", t(1000))) // admitted; expiry 1010
      q.processAllAvailable()
      input.addData(("a", 2L, "t", t(960))) // valid straggler, saturated — drained
      q.processAllAvailable()
      input.addData(("b", 10L, "t", t(1025))) // wm → 975: past the buggy 970
      q.processAllAvailable()
      input.addData(("b", 11L, "t", t(1026)))
      q.processAllAvailable()
      // a's quota window must still be closed at t=1020
      input.addData(("a", 3L, "t", t(1020)))
      q.processAllAvailable()
      val got = spark.table("quota_mono").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(got == Set("a" -> 1L, "b" -> 10L),
        s"doc 3 must be refused (window keyed off t=1000): $got")
    } finally q.stop()
  }

  test("EmbStream.centroidsOf reads the persisted index's coarse centroids in cid order") {
    val p = java.nio.file.Files.createTempDirectory("graftcents").toString
    Seq((1, Seq(-10.0, 0.0)), (0, Seq(10.0, 0.0)))
      .toDF("cid", "centroid").write.parquet(s"$p/centroids")
    assert(graft.streaming.EmbStream.centroidsOf(spark, p) ==
      Seq(Seq(10.0, 0.0), Seq(-10.0, 0.0)))
  }

  test("mm_pipeline: binary plumbing end to end, deterministic features") {
    val out = graft.operators.Multimodal.mm_pipeline(spark, dir)
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getLong(2) > 0)) // n_bytes
    assert(out.columns.toSeq ==
      Seq("doc_id", "format", "n_bytes", "f0", "thumb_w", "thumb_h", "n_frames"))
    // deterministic across runs
    val again = graft.operators.Multimodal.mm_pipeline(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("streaming gates drop poison rows at the edge: null text (ingestDedup), null embedding (semanticDedupGate)") {
    // two DISTINCT null-text docs must not collapse onto the null digest
    // (dropDuplicatesWithinWatermark treats null keys as equal — one would
    // be silently discarded as a 'duplicate' of the other)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val stream = input.toDF().toDF("doc_id", "ingest_ts", "text")
    val q = DocsStream.ingestDedup(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_null").start()
    try {
      input.addData((1L, t(0), null), (2L, t(1), null), (3L, t(2), "real text"))
      q.processAllAvailable()
      assert(spark.table("dedup_null").select("doc_id")
        .as[Long].collect().toSet == Set(3L))
    } finally q.stop()
    // one null embedding must not crash-loop the gate (VecNearest is
    // nullIntolerant → non-nullable-Int deserialization failure replayed
    // on every restart) — dropped at the edge like null event times
    val cents = Seq(Seq(10.0, 0.0), Seq(-10.0, 0.0))
    val in2 = MemoryStream[(Long, Seq[Float])](spark)
    val s2 = in2.toDF().toDF("vec_id", "embedding")
    val q2 = EmbStream.semanticDedupGate(s2, cents, threshold = 0.95, stateCap = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("emb_null").start()
    try {
      in2.addData((1L, Seq(1f, 0f)), (2L, null), (3L, Seq(-1f, 0f)))
      q2.processAllAvailable()
      assert(spark.table("emb_null").select("vec_id")
        .as[Long].collect().toSet == Set(1L, 3L))
    } finally q2.stop()
  }

  test("extractGate: boilerplate stripped on the stream with the batch operator's exact semantics; empty extractions dropped") {
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "text")
    val q = DocsStream.extractGate(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("extract_gate").start()
    try {
      input.addData(
        (1L, "<html><head><script>var a=1;</script></head><body>\n" +
          "<div><a href=\"/h\">home</a> <a href=\"/a\">about</a> <a href=\"/f\">faq</a></div>\n" +
          "<p>real content words live here</p>\n</body></html>"),
        (2L, "plain text with no markup at all"),
        (3L, "<div><a href=\"/x\">only</a> <a href=\"/y\">links</a></div>")) // pure boilerplate
      q.processAllAvailable()
      val got = spark.table("extract_gate")
        .select("doc_id", "text", "had_html", "n_kept").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2), r.getLong(3)))).toMap
      assert(got.keySet == Set(1L, 2L)) // doc 3 extracts to nothing → dropped
      assert(got(1L) == (("real content words live here", true, 1L)))
      assert(got(2L) == (("plain text with no markup at all", false, 1L)))
    } finally q.stop()
  }

  test("urlGate: blocklisted domains dropped at the stream edge with the batch parse") {
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "url")
    val q = DocsStream.urlGate(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("url_gate").start()
    try {
      input.addData(
        (1L, "https://www.example.com/p/1"),
        (2L, "http://spam.casino-ads.net/p/2"), // blocked domain
        (3L, "https://ads.tracker.io:8080/p/3?q=1"), // blocked, port+query
        (4L, "http://en.wikipedia.org/p/4"))
      q.processAllAvailable()
      assert(spark.table("url_gate").select("doc_id")
        .as[Long].collect().toSet == Set(1L, 4L))
    } finally q.stop()
  }

  test("authorityGate: only authorized domains pass; parity with the funnel's batch authority set") {
    // the batch artifact: the same authority set pipeline_release gates on
    val authorized = graft.operators.Graph
      .domainAuthority(spark, dir).collect().map(_.getString(0)).toSeq
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "url")
    val q = DocsStream.authorityGate(stream, authorized)
      .writeStream.outputMode("append")
      .format("memory").queryName("auth_gate").start()
    try {
      // one url per host in the pool, plus the null-domain drop paths the
      // scaladoc promises: an unparseable url, a single-label host (whose
      // registered-domain parse has no [-2] element), and a null url
      val urls = graft.operators.TextAnalysis.urlHosts.zipWithIndex
        .map { case (h, i) => (i.toLong, s"https://$h/p/$i") } ++
        Seq((100L, "not-a-url"), (101L, "https://localhost/p/1"),
          (102L, null.asInstanceOf[String]))
      input.addData(urls: _*)
      q.processAllAvailable()
      val passed = spark.table("auth_gate").select("domain")
        .as[String].collect().toSet
      assert(passed == authorized.toSet,
        "the stream edge must admit exactly the batch-authorized domains")
      assert(passed.nonEmpty &&
        passed.size < graft.operators.TextAnalysis.urlHosts.size)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      DocsStream.authorityGate(stream, Seq.empty)
    }
  }

  test("scoreGate: stream-edge keep set equals the batch scorer's, for fixed AND trained weights") {
    val docs = graft.sources.Tables.loadParallel(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getString(1)))
    def run(name: String, weights: Option[Seq[Long]]): Set[Long] = {
      val input = MemoryStream[(Long, String)](spark)
      val stream = input.toDF().toDF("doc_id", "text")
      val gated = weights.fold(DocsStream.scoreGate(stream))(
        w => DocsStream.scoreGate(stream, w))
      val q = gated.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(docs: _*)
        q.processAllAvailable()
        spark.table(name).select("doc_id").as[Long].collect().toSet
      } finally q.stop()
    }
    val batchFixed = graft.operators.TextAnalysis.tx_score(spark, dir)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(run("score_gate_fixed", None) == batchFixed)
    val trained = graft.operators.TextAnalysis.trainScoreWeights(spark, dir, 8)
    val batchTrained = graft.operators.TextAnalysis.tx_score_trained(spark, dir)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(run("score_gate_trained", Some(trained)) == batchTrained)
    assert(batchTrained != batchFixed,
      "the two weight sets must gate differently on this corpus, " +
        "or the trained-weights leg of this test is vacuous")
  }

  test("langidGate: stream-edge keep set and predictions equal the batch trained scorer's; bad configs refuse") {
    // the shared five-language plant (graft.TestPlants — ONE corpus
    // definition with the tx_langid2 plant spec): the trained scorer
    // separates it exactly, so a two-language keep set REALLY splits the
    // stream — on the shipped corpus the majority-learner predicts one
    // class and a keep-set parity would be vacuous
    val rows = graft.TestPlants.langidRows
    val plantDir = graft.TestPlants.langidDir(spark)
    val weights = graft.operators.TextAnalysis.trainLangidWeights(spark, plantDir, 8)
    val batch = graft.operators.TextAnalysis.tx_langid2(spark, plantDir)
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    val keep = Set("en", "zh")
    val input = MemoryStream[(Long, String)](spark)
    val gated = DocsStream.langidGate(
      input.toDF().toDF("doc_id", "text"), weights, keep)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("langid_gate").start()
    val got =
      try {
        input.addData(rows.map(r => (r._1, r._2)): _*)
        q.processAllAvailable()
        spark.table("langid_gate").select("doc_id", "predicted")
          .as[(Long, String)].collect().toMap
      } finally q.stop()
    val want = batch.filter { case (_, p) => keep(p) }
    assert(got == want,
      "the stream edge must admit exactly the batch scorer's keep set, " +
        "with identical per-doc predictions")
    assert(want.nonEmpty && want.size < batch.size,
      "the keep set must actually split this corpus or the parity is vacuous")
    // the low-confidence drop: a minMargin above the weakest kept doc's
    // margin must shrink the admitted set to exactly the batch rows at or
    // above it — same margins, same docs (confidence filtering is the
    // CCNet production shape)
    val margins = graft.operators.TextAnalysis.tx_langid2(spark, plantDir)
      .filter(col("predicted").isInCollection(keep.toSeq))
      .select("doc_id", "margin").as[(Long, Long)].collect().toMap
    val cut = margins.values.toSeq.sorted.apply(margins.size / 2)
    val input2 = MemoryStream[(Long, String)](spark)
    val gated2 = DocsStream.langidGate(
      input2.toDF().toDF("doc_id", "text"), weights, keep, minMargin = cut)
    val q2 = gated2.writeStream.outputMode("append")
      .format("memory").queryName("langid_gate_margin").start()
    val got2 =
      try {
        input2.addData(rows.map(r => (r._1, r._2)): _*)
        q2.processAllAvailable()
        spark.table("langid_gate_margin").select("doc_id").as[Long].collect().toSet
      } finally q2.stop()
    val want2 = margins.filter(_._2 >= cut).keySet
    assert(got2 == want2 && want2.size < margins.size,
      s"minMargin=$cut must admit exactly the batch rows at/above it")
    // misconfigurations refuse loudly instead of silently draining the stream
    val s0 = input.toDF().toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException](
      DocsStream.langidGate(s0, weights, Set.empty)).getMessage.contains("empty keep"))
    assert(intercept[IllegalArgumentException](
      DocsStream.langidGate(s0, weights, Set("xx"))).getMessage.contains("no weight"))
  }

  test("bm25Gate: stream-edge scores equal the batch screen's full matrix; null text passes; oversize docs refuse loudly") {
    import graft.operators.Curation
    val gdir = "/root/testdata/sf0.001"
    val (n, sTot, queries) = Curation.bm25GateArtifact(spark, gdir)
    // batch FULL matrix (k past the train-doc count): per doc, the best
    // (score, eval) with the batch tie-break (smallest eval id)
    val full = Curation.decon_bm25(spark, gdir, k = 1000000)
      .select("eval_id", "doc_id", "score_fp").as[(Long, Long, Long)].collect()
    val bestByDoc = full.groupBy(_._2).map { case (d, rs) =>
      val best = rs.map(r => (r._3, -r._1)).max
      d -> ((best._1, -best._2))
    }
    val trainRows = Tables.loadParallel(spark, gdir, "documents")
      .filter(col("source") =!= "src0")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)](spark)
    val gated = DocsStream.bm25Gate(input.toDF().toDF("doc_id", "text"),
      n, sTot, queries, maxScoreFp = Long.MaxValue)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("bm25_gate").start()
    val got =
      try {
        input.addData(trainRows :+ ((999999L, null: String)): _*)
        q.processAllAvailable()
        spark.table("bm25_gate")
          .select("doc_id", "bm25_score_fp", "bm25_best_eval")
          .as[(Long, Long, Long)].collect().toSeq
      } finally q.stop()
    assert(got.size == trainRows.size + 1,
      "a permissive threshold must admit every doc, null text included")
    got.foreach { case (d, sc, be) =>
      bestByDoc.get(d) match {
        case Some((bs, bev)) =>
          assert(sc == bs && be == bev,
            s"doc $d: stream ($sc, $be) != batch best ($bs, $bev)")
        case None =>
          assert(sc == 0L, s"doc $d matched no query term yet scored $sc")
      }
    }
    assert(got.exists(_._2 > 0L), "the parity must not be vacuously all-zero")
    // the broadcast+UDF form (the large-query-table device) is bit-equal
    // to the typedLit form on the same rows — scores AND tie-broken evals
    val inputB = MemoryStream[(Long, String)](spark)
    val gatedB = DocsStream.bm25GateBroadcast(inputB.toDF().toDF("doc_id", "text"),
      n, sTot, queries, maxScoreFp = Long.MaxValue)
    val qB = gatedB.writeStream.outputMode("append")
      .format("memory").queryName("bm25_gate_bcast").start()
    val gotB =
      try {
        inputB.addData(trainRows :+ ((999999L, null: String)): _*)
        qB.processAllAvailable()
        spark.table("bm25_gate_bcast")
          .select("doc_id", "bm25_score_fp", "bm25_best_eval")
          .as[(Long, Long, Long)].collect().toSeq
      } finally qB.stop()
    assert(gotB.toSet == got.toSet,
      "bm25GateBroadcast must be bit-equal to the typedLit gate")
    // the screen actually screens: a threshold AT the observed max drops
    // exactly the max-scoring docs and keeps the rest
    val top = got.map(_._2).max
    val input2 = MemoryStream[(Long, String)](spark)
    val gated2 = DocsStream.bm25Gate(input2.toDF().toDF("doc_id", "text"),
      n, sTot, queries, maxScoreFp = top)
    val q2 = gated2.writeStream.outputMode("append")
      .format("memory").queryName("bm25_gate_cut").start()
    val got2 =
      try {
        input2.addData(trainRows: _*)
        q2.processAllAvailable()
        spark.table("bm25_gate_cut").select("doc_id").as[Long].collect().toSet
      } finally q2.stop()
    assert(got2 == got.filter(r => r._2 < top && r._1 != 999999L).map(_._1).toSet,
      "threshold must drop exactly the docs at/above it")
    // oversize doc: the score would overflow BIGINT-exact range — the
    // stream fails loudly instead of quietly passing a contaminated doc
    val input3 = MemoryStream[(Long, String)](spark)
    val gated3 = DocsStream.bm25Gate(input3.toDF().toDF("doc_id", "text"),
      n, sTot, queries, maxScoreFp = Long.MaxValue, maxDl = 2L)
    val q3 = gated3.writeStream.outputMode("append")
      .format("memory").queryName("bm25_gate_over").start()
    val e = intercept[Exception] {
      try {
        input3.addData((1L, "a b c"))
        q3.processAllAvailable()
      } finally q3.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exceeds maxDl")),
      s"oversize doc must fail with the overflow message, got: ${messages(e)}")
    // misconfigurations refuse loudly instead of silently draining
    val s0 = input.toDF().toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException](
      DocsStream.bm25Gate(s0, n, sTot, Seq.empty, 1L))
      .getMessage.contains("empty query table"))
    assert(intercept[IllegalArgumentException](
      DocsStream.bm25Gate(s0, n, sTot, queries, 0L))
      .getMessage.contains("maxScoreFp=0"))
    assert(intercept[IllegalArgumentException](
      DocsStream.bm25Gate(s0, 0L, sTot, queries, 1L))
      .getMessage.contains("priced no training tokens"))
  }

  test("driftStream: running (feature, bucket) counts equal the batch census; state grows with buckets, not volume") {
    val docsDf = graft.sources.Tables.loadParallel(spark, dir, "documents")
    val rows = docsDf.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSeq
    val input = MemoryStream[(Long, String, String)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "lang")
    val q = DocsStream.driftStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("drift_out").start()
    try {
      // split across two batches: the counts must accumulate in state
      val (b1, b2) = rows.splitAt(rows.size / 2)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("drift_out").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // the batch census side (n1 of profile_drift over the same corpus)
      val batch = graft.operators.Curation.profile_drift(spark, dir)
        .select("feature", "bucket", "n1").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"edge counts must equal the batch census: $streamed vs $batch")
      // bounded state: one row per (feature, bucket), not per document
      assert(streamed.size < rows.size / 2)
    } finally q.stop()
  }

  test("deconUrlGate: stream-edge drop set equals batch decon_url's flags; unparseable urls pass a REMOVE screen") {
    import graft.operators.TextAnalysis
    // the batch artifact: normalized source URLs of the eval slice, the
    // same slice decon_url screens against (doc_id residue mod 3)
    val evalMod = 3
    val docsDf = graft.sources.Tables.loadParallel(spark, dir, "documents")
    val evalUrls = docsDf.filter(pmod(col("doc_id"), lit(evalMod)) === 0)
      .select(TextAnalysis.normUrl(col("doc_id")).as("u"))
      .distinct().as[String].collect().toSeq
    val training = docsDf.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .select(col("doc_id"), TextAnalysis.urlPlant(col("doc_id")).as("url"))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "url")
    val q = DocsStream.deconUrlGate(stream, evalUrls)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_url_gate").start()
    try {
      input.addData(training.toSeq: _*)
      input.addData((9001L, "not-a-url"), (9002L, null.asInstanceOf[String]))
      q.processAllAvailable()
      val passed = spark.table("decon_url_gate").select("doc_id")
        .as[Long].collect().toSet
      val batchFlagged = graft.operators.Curation.decon_url(spark, dir, evalMod)
        .select("doc_id").as[Long].collect().toSet
      assert(batchFlagged.nonEmpty, "vacuous parity: batch screen flags nothing")
      val dropped = training.map(_._1).toSet -- passed
      assert(dropped == batchFlagged,
        "the stream edge must drop exactly the batch-flagged documents")
      // REMOVE-screen semantics: unknown provenance passes
      assert(passed.contains(9001L) && passed.contains(9002L))
    } finally q.stop()
    intercept[IllegalArgumentException] {
      DocsStream.deconUrlGate(stream, Seq.empty)
    }
  }

  test("perplexityGate: full-LM keep set equals batch tx_perplexity's non-tail buckets; short/null docs drop; prune cap holds") {
    import graft.operators.TextAnalysis
    // the batch artifact: the default maxEntries (64k) exceeds the
    // sf0.001 bigram vocabulary, so this is the FULL LM — parity is exact
    val lm = TextAnalysis.perplexityLmArtifact(spark, dir)
    val docs = Tables.loadParallel(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "text")
    val q = DocsStream.perplexityGate(stream, lm)
      .writeStream.outputMode("append")
      .format("memory").queryName("pplx_gate").start()
    try {
      input.addData(docs.toSeq: _*)
      // the scaladoc'd drop paths: a 1-token doc and a null text
      input.addData((90001L, "solo"), (90002L, null.asInstanceOf[String]))
      q.processAllAvailable()
      val out = spark.table("pplx_gate")
      val passed = out.select("doc_id").as[Long].collect().toSet
      val batch = TextAnalysis.tx_perplexity(spark, dir)
        .select("doc_id", "sb_mean", "bucket")
        .as[(Long, Long, String)].collect()
      val batchKeep = batch.filter(_._3 != "tail").map(_._1).toSet
      assert(batch.exists(_._3 == "tail"),
        "vacuous parity: the batch tail bucket is empty on this corpus")
      assert(passed == batchKeep,
        "the stream edge must keep exactly the batch non-tail documents")
      assert(!passed.contains(90001L) && !passed.contains(90002L))
      // the audit column replays the batch algebra bit-for-bit
      val gateMeans = out.select("doc_id", "sb_mean")
        .as[(Long, Long)].collect().toMap
      assert(gateMeans == batch.filter(_._3 != "tail")
        .map(t => t._1 -> t._2).toMap)
    } finally q.stop()
    // prune determinism + cap: same t and cut, maps bounded by maxEntries
    val pruned = TextAnalysis.perplexityLmArtifact(spark, dir, maxEntries = 3)
    assert(pruned.seen.size == 3 && pruned.c1.size == 3 &&
      pruned.t == lm.t && pruned.tailCut == lm.tailCut)
    assert(pruned.seen.keySet.subsetOf(lm.seen.keySet) &&
      pruned.c1.keySet.subsetOf(lm.c1.keySet))
    intercept[IllegalArgumentException] {
      DocsStream.perplexityGate(stream,
        TextAnalysis.PerplexityLm(Map.empty, Map.empty, 0L, 0.0))
    }
  }

  test("dsirGate: stream-edge lambda equals batch samp_dsir's for every doc; threshold keep set exact; unseen buckets score the smoothed zero; bad config refuses") {
    import graft.operators.Curation
    val w = Curation.dsirGateArtifact(spark, dir)
    // batch reference: samp_dsir with k >= corpus size selects every doc,
    // carrying the full lambda table
    val batch = Curation.samp_dsir(spark, dir, k = 100000).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.loadParallel(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "text")
    val q = DocsStream.dsirGate(stream, w, Long.MinValue)
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_gate").start()
    try {
      input.addData(docs.toSeq: _*)
      // an all-unseen-bigram doc: every bucket lookup takes the smoothed
      // zero, so lambda = (#grams)·constFp exactly; and a null text drops
      input.addData((90001L, "zzqqx wwyyk vvjjr"), // 2 bigrams
        (90002L, null.asInstanceOf[String]))
      q.processAllAvailable()
      val got = spark.table("dsir_gate").select("doc_id", "lambda_fp")
        .as[(Long, Long)].collect().toMap
      assert((got - 90001L) == batch,
        "stream-edge lambda must equal the batch operator's for every doc")
      assert(got(90001L) == 2L * w.constFp)
      assert(!got.contains(90002L))
    } finally q.stop()
    // threshold semantics: the keep set is exactly the docs at or above
    val cut = batch.values.toSeq.sorted.apply(batch.size / 2)
    val input2 = MemoryStream[(Long, String)](spark)
    val q2 = DocsStream.dsirGate(input2.toDF().toDF("doc_id", "text"), w, cut)
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_gate_cut").start()
    try {
      input2.addData(docs.toSeq: _*)
      q2.processAllAvailable()
      val kept = spark.table("dsir_gate_cut").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == batch.filter(_._2 >= cut).keySet && kept.nonEmpty &&
        kept.size < batch.size)
    } finally q2.stop()
    intercept[IllegalArgumentException] {
      DocsStream.dsirGate(stream,
        Curation.DsirWeights(Map.empty, 0L, 3), 0L)
    }
    intercept[IllegalArgumentException] {
      Curation.dsirGateArtifact(spark, dir, hexChars = 6)
    }
    intercept[IllegalArgumentException] {
      Curation.dsirGateArtifact(spark, dir, targetLang = "xx")
    }
  }

  test("c4Chain: the full ingest chain end-to-end on a stream equals its batch composition; generous throughput floor") {
    import graft.operators.TextAnalysis
    // the five per-snapshot batch artifacts the chain ships as values
    val authorized = graft.operators.Graph
      .domainAuthority(spark, dir).collect().map(_.getString(0)).toSeq
    val langidW = TextAnalysis.trainLangidWeights(spark, dir, 8)
    val scoreW = TextAnalysis.trainScoreWeights(spark, dir, 8)
    val lm = TextAnalysis.perplexityLmArtifact(spark, dir)
    val keep = Set("en", "zh")
    def chain(df: org.apache.spark.sql.DataFrame) =
      DocsStream.c4Chain(df, authorized, langidW, keep, scoreW, lm)
    def withUrl(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("url", TextAnalysis.urlPlant(col("doc_id")))

    val batchKept = chain(withUrl(Tables.load(spark, dir, "documents")))
      .select("doc_id").as[Long].collect().toSet
    val n = Tables.load(spark, dir, "documents").count()
    assert(batchKept.nonEmpty && batchKept.size < n,
      "vacuous chain: every stage must engage on this corpus")

    val docs = Tables.loadParallel(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val stream = withUrl(input.toDF().toDF("doc_id", "text"))
    val q = chain(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("c4_chain").start()
    val wallSec = try {
      input.addData(docs.toSeq: _*)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val w = (System.nanoTime() - t0) / 1e9
      val streamed = spark.table("c4_chain")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batchKept,
        "the stream-edge chain must keep exactly the batch composition's docs")
      w
    } finally q.stop()
    // generous floor (≈100× slack vs the measured §8.5 rate) — catches a
    // chain gone quadratic or stateful, not box noise
    assert(wallSec < 120.0,
      s"c4Chain took ${wallSec}s for $n docs — the stateless map-only " +
        "chain shape is broken")
  }

  test("c4Chain with decon screens: stream equals batch; every screen engages; defaults-off chain is unchanged") {
    import graft.operators.{Curation, TextAnalysis}
    val authorized = graft.operators.Graph
      .domainAuthority(spark, dir).collect().map(_.getString(0)).toSeq
    val langidW = TextAnalysis.trainLangidWeights(spark, dir, 8)
    val scoreW = TextAnalysis.trainScoreWeights(spark, dir, 8)
    val lm = TextAnalysis.perplexityLmArtifact(spark, dir)
    val keep = Set("en", "zh")
    def withUrl(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("url", TextAnalysis.urlPlant(col("doc_id")))
    val batchDocs = withUrl(Tables.load(spark, dir, "documents"))
    val off = DocsStream
      .c4Chain(batchDocs, authorized, langidW, keep, scoreW, lm)
      .select("doc_id").as[Long].collect().toSet
    // the three screen artifacts via the ONE shared derivation
    // ([[DocsStream.screenArtifacts]] — survivor-quartile thresholds, so
    // every screen provably bites on a survivor while the stacked
    // composition stays nonempty): the bench's screens=on mode calls the
    // SAME function, so this spec certifies exactly what it measures
    val (evalUrls, dsirScreen, bm25Screen) =
      DocsStream.screenArtifacts(spark, dir, off)
    val dsirS = Some(dsirScreen)
    val bm25S = Some(bm25Screen)
    intercept[IllegalArgumentException] {
      DocsStream.screenArtifacts(spark, dir, Set.empty)
    }
    // the in-plan quartile spelling (survivor semi-join + executor-side
    // order statistic) must be BIT-IDENTICAL to the driver-side reference
    // it replaced: sorted.apply(⌊(n−1)q⌋) over the survivors' signals
    locally {
      def quartRef(xs: Seq[Long], q: Double): Long = {
        val v = xs.sorted; v(((v.size - 1) * q).toInt)
      }
      val lamRef = quartRef(graft.operators.Curation
        .samp_dsir(spark, dir, k = Int.MaxValue)
        .select("doc_id", "lambda_fp").as[(Long, Long)].collect()
        .filter(r => off.contains(r._1)).map(_._2).toSeq, 0.25)
      assert(dsirScreen.minLambda == lamRef,
        "in-plan DSIR λ quartile must match the driver-side order statistic")
      val scoreRef = math.max(1L, quartRef(DocsStream.bm25Gate(
          Tables.loadParallel(spark, dir, "documents")
            .select("doc_id", "text"),
          bm25Screen.n, bm25Screen.sTot, bm25Screen.queries,
          maxScoreFp = Long.MaxValue, maxDl = bm25Screen.maxDl)
        .select("doc_id", "bm25_score_fp").as[(Long, Long)].collect()
        .filter(r => off.contains(r._1)).map(_._2).toSeq, 0.75))
      assert(bm25Screen.maxScoreFp == scoreRef,
        "in-plan BM25 quartile must match the driver-side order statistic")
    }
    def chain(df: org.apache.spark.sql.DataFrame,
        urls: Seq[String] = evalUrls,
        d: Option[DocsStream.DsirScreen] = dsirS,
        b: Option[DocsStream.Bm25Screen] = bm25S) =
      DocsStream.c4Chain(df, authorized, langidW, keep, scoreW, lm, urls, d, b)
    val on = chain(batchDocs).select("doc_id").as[Long].collect().toSet
    assert(on.subsetOf(off), "screens only REMOVE documents")
    // each screen individually bites (drops something the others keep)
    val urlOnly = chain(batchDocs, evalUrls, None, None)
      .select("doc_id").as[Long].collect().toSet
    val dsirOnly = chain(batchDocs, Seq.empty, dsirS, None)
      .select("doc_id").as[Long].collect().toSet
    val bm25Only = chain(batchDocs, Seq.empty, None, bm25S)
      .select("doc_id").as[Long].collect().toSet
    assert(urlOnly.size < off.size, "the URL decon screen must engage")
    assert(dsirOnly.size < off.size, "the DSIR screen must engage")
    assert(bm25Only.size < off.size, "the BM25 decon screen must engage")
    assert(on.nonEmpty, "vacuous screens: nothing survives the full chain")
    // the screened chain's output carries the BM25 audit columns
    assert(chain(batchDocs).columns.contains("bm25_score_fp"))
    // the size-gated BM25 form selection: both spellings of the screen
    // keep exactly the same documents WITH the same audit values through
    // the full chain (the gate-level bit-parity spec, re-certified at
    // chain granularity), and the auto gate follows the query-table size
    locally {
      def audit(b: DocsStream.Bm25Screen) =
        chain(batchDocs, evalUrls, dsirS, Some(b))
          .select("doc_id", "bm25_score_fp", "bm25_best_eval")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1).toSeq
      val lit = audit(bm25Screen.copy(broadcast = Some(false)))
      val bc = audit(bm25Screen.copy(broadcast = Some(true)))
      assert(lit == bc,
        "chain with bm25GateBroadcast must equal the typedLit form bit-for-bit")
      assert(bm25Screen.copy(broadcast = None).useBroadcast ==
        (bm25Screen.queries.size >= DocsStream.bm25BroadcastMinQueries),
        "auto selection must follow the size gate")
    }
    // stream == batch with all screens on
    val docsRows = Tables.loadParallel(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val q = chain(withUrl(input.toDF().toDF("doc_id", "text")))
      .writeStream.outputMode("append")
      .format("memory").queryName("c4_screened").start()
    try {
      input.addData(docsRows.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("c4_screened")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == on,
        "the screened stream chain must keep exactly the batch composition")
    } finally q.stop()
  }

  test("embChain: the composed two-stage query equals the gates composed manually; retained subset; censuses consistent") {
    import graft.streaming.EmbStream
    val cents = graft.operators.Clustering.initCentroids(
      Tables.loadParallel(spark, dir, "embeddings"), 10)
    val vecs = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // reference: the two gates run as SEPARATE queries, dedup's admitted
    // rows fed to the diversity gate by hand
    val in1 = MemoryStream[(Long, Seq[Float])](spark)
    val q1 = EmbStream.semanticDedupGate(
        in1.toDF().toDF("vec_id", "embedding"), cents)
      .writeStream.outputMode("append").format("memory")
      .queryName("chain_ref_sem").start()
    val admittedIds = try {
      in1.addData(vecs.toSeq: _*)
      q1.processAllAvailable()
      spark.table("chain_ref_sem").filter(col("admitted"))
        .select("vec_id").as[Long].collect().toSet
    } finally q1.stop()
    val admittedVecs = vecs.filter(v => admittedIds.contains(v._1))
    val in2 = MemoryStream[(Long, Seq[Float])](spark)
    val q2 = EmbStream.diversityGate(
        in2.toDF().toDF("vec_id", "embedding"), kPerShard = 4, shards = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("chain_ref_div").start()
    val refRows = try {
      in2.addData(admittedVecs.toSeq: _*)
      q2.processAllAvailable()
      spark.table("chain_ref_div").collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(7))).toSeq
        .sortBy(_._1)
    } finally q2.stop()
    // the composed chain, one query
    val in3 = MemoryStream[(Long, Seq[Float])](spark)
    val q3 = EmbStream.embChain(in3.toDF().toDF("vec_id", "embedding"),
        cents, kPerShard = 4, shards = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("chain_composed").start()
    val gotRows = try {
      in3.addData(vecs.toSeq: _*)
      q3.processAllAvailable()
      spark.table("chain_composed").collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(7))).toSeq
        .sortBy(_._1)
    } finally q3.stop()
    assert(gotRows == refRows,
      "the composed chain must decide exactly like the manual composition")
    assert(gotRows.map(_._1).toSet == admittedIds,
      "the diversity stage sees exactly the dedup stage's admissions")
    val div = gotRows.filter(_._2)
    assert(div.nonEmpty && div.size < gotRows.size,
      "both stages must discriminate on this corpus")
    assert(gotRows.filter(_._3).forall(_._2), "retained implies admitted")
  }

  test("diversityGate coverage: the retained sketch covers the corpus within a constant of the batch k-center at matched budget") {
    import graft.streaming.EmbStream
    val vecs = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // the gate's FINAL sketch is not observable from decision rows (later
    // cascades merge earlier centers) — replay the pinned algebra (the
    // trace spec certifies the gate against this same replay) to get the
    // end-of-stream centers per shard
    val shards = 4
    val kPerShard = 2 // budget 8 = the batch family's kcenterK
    val sketches = scala.collection.mutable.Map
      .empty[Long, (Double, List[(Long, Seq[Float])])]
    vecs.sortBy(_._1).foreach { case (id, vec) =>
      val sh = ((id % shards) + shards) % shards
      var (r2, centers) = sketches.getOrElse(sh, (0.0, Nil))
      val covered = centers.exists(c => EmbStream.sqDist(vec, c._2) <= r2)
      if (!covered) {
        centers = centers :+ ((id, vec))
        while (centers.size > kPerShard) {
          r2 = if (r2 > 0.0) r2 * 4.0
          else centers.combinations(2).map {
            case Seq((_, a), (_, b)) => EmbStream.sqDist(a, b)
          }.min
          centers = centers.foldLeft(List.empty[(Long, Seq[Float])]) {
            (kept, c) =>
              if (kept.exists(k => EmbStream.sqDist(k._2, c._2) <= r2)) kept
              else kept :+ c
          }
        }
      }
      sketches(sh) = (r2, centers)
    }
    val gateCenters = sketches.values.flatMap(_._2.map(_._2)).toSeq
    assert(gateCenters.size <= shards * kPerShard)
    def coverage(centers: Seq[Seq[Float]]): Double =
      vecs.map { case (_, v) =>
        centers.map(c => EmbStream.sqDist(v, c)).min
      }.max
    val gateRadius = coverage(gateCenters)
    // batch reference at the same total budget: samp_kcenter_sharded's
    // k = shards * kPerShard selections
    val sel = graft.operators.Clustering
      .samp_kcenter_sharded(spark, dir).collect().map(_.getLong(1)).toSet
    val byId = vecs.toMap
    val batchRadius = coverage(sel.toSeq.map(byId))
    // the doubling algorithm's constant, MEASURED on this corpus and
    // pinned with slack: the online sketch may not coarsen past 8× the
    // batch coreset's coverage radius (measured ratio ~2-4×; 8× trips on
    // a genuine regression — a doubling-cascade or merge-rule bug blows
    // the radius geometrically, not by small factors)
    assert(gateRadius <= 8.0 * batchRadius,
      s"online coverage $gateRadius vs batch $batchRadius — the doubling " +
        "sketch coarsened beyond its constant")
  }

  test("StateClock.monotoneTimeoutMs: past-watermark clamp; saturates instead of wrapping near Long.MaxValue") {
    assert(StateClock.monotoneTimeoutMs(100L, 50L, 10L) == 150L)
    assert(StateClock.monotoneTimeoutMs(100L, 50L, 200L) == 201L) // clamp
    assert(StateClock.monotoneTimeoutMs(Long.MaxValue - 10L, Long.MaxValue / 2, 0L)
      == Long.MaxValue) // a wrapped sum would expire lifetime state instantly
  }

  test("windowedAgg emits v as DOUBLE — the q23_events_window twin's schema, not Decimal(38,2)") {
    val batch = EventsStream.windowedAgg(Tables.load(spark, dir, "events"), watermark = false)
    assert(batch.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
  }
}
