package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{col, count, explode, expr, lit, regexp_count}

import graft.streaming.{Event, EventStreams}

/** Document row for the near-dup streaming tests (top-level: Spark
  * cannot derive an Encoder for a method-local case class).
  */
case class StreamDoc(doc_id: Long, ts: Instant, text: String)
case class StreamLangDoc(doc_id: Long, ts: Instant, text: String, lang: String)

/** Drives the real streaming paths (SURVEY.md §2.C) through MemoryStream
  * and a parquet file source; asserts the stream results agree with the
  * shared batch core where both exist.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  private def ts(minute: Int): Instant =
    Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60L)

  private def chk(): String = Files.createTempDirectory("graft-chk").toString

  test("C5+ streaming near-dup band pairs == batch pairs on the same docs") {
    val docs = Seq(
      StreamDoc(1, ts(0), "the quick brown fox jumps over the lazy dog again and again today"),
      StreamDoc(2, ts(10), "the quick brown fox jumps over the lazy dog again and again tonight"),
      StreamDoc(3, ts(20), "completely different content about spark streaming joins and state expiry"),
      StreamDoc(4, ts(400), "the quick brown fox jumps over the lazy dog again and again today"),
      StreamDoc(5, ts(405), "the quick brown fox jumps over the lazy dog again and again tomorrow"))
    val input = MemoryStream[StreamDoc](spark)
    val q = EventStreams
      .nearDupPairsStream(input.toDF(), within = "1 hour", delay = "2 hours")
      .writeStream.format("memory").queryName("c5p_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(docs: _*)
    q.processAllAvailable()
    // advance the watermark far enough to flush the pair-dedup state
    input.addData(StreamDoc(99, ts(2000), "watermark advancing sentinel document with plenty of words here"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("c5p_sink").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = EventStreams.nearDupPairsBatch(docs.toDF(), within = "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"stream=$got batch=$want")
    // (1,2) are near-dups in window; (4,5) likewise; (1,4) same text but
    // outside the 1h horizon — must NOT pair
    assert(want.contains((1L, 2L)) && want.contains((4L, 5L)))
    assert(!want.contains((1L, 4L)))
  }

  test("C12 streaming decontamination == batch q56 logic on the same docs") {
    val bench = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten").toDF("text")
      .select(explode(graft.functions.GraftFunctions.textShingles(col("text"), 8))
        .as("gram"))
    val docs = Seq(
      StreamDoc(1, ts(0), "x alpha beta gamma delta epsilon zeta eta theta y z"), // hits
      StreamDoc(2, ts(10), "clean document with entirely novel words nothing shared at all"),
      StreamDoc(3, ts(20), "one two three four five six seven eight nine ten exact copy")) // hits
    val input = MemoryStream[StreamDoc](spark)
    val q = EventStreams.contaminationStream(input.toDF(), bench)
      .writeStream.format("memory").queryName("c12_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(docs: _*)
    q.processAllAvailable()
    input.addData(StreamDoc(99, ts(2000), "watermark advancing sentinel document with plenty of words here"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("c12_sink").select("doc_id", "n_hits")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // batch reference: same explode-join-count over the same frames
    val want = docs.toDF()
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.textShingles(col("text"), 8)).as("gram"))
      .join(bench.distinct(), Seq("gram"))
      .groupBy("doc_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want, s"stream=$got batch=$want")
    assert(got.contains(1L) && got.contains(3L) && !got.contains(2L))
  }

  test("C7+ stream-stream as-of == batch as-of restricted to the horizon") {
    val trades = Seq(
      Event(101, ts(30), 1, "trade", 10.0),
      Event(102, ts(90), 1, "trade", 20.0),
      Event(103, ts(50), 2, "trade", 30.0),
      Event(104, ts(500), 1, "trade", 40.0))
    val quotes = Seq(
      Event(201, ts(10), 1, "quote", 1.1),
      Event(202, ts(25), 1, "quote", 1.2),
      Event(203, ts(80), 1, "quote", 1.3),
      Event(204, ts(45), 2, "quote", 2.1))
    val lIn = MemoryStream[Event](spark)
    val rIn = MemoryStream[Event](spark)
    val q = EventStreams
      .asOfStream(lIn.toDF(), rIn.toDF(), "user_id",
        horizon = "1 hour", delay = "2 hours")
      .writeStream.format("memory").queryName("c7p_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    lIn.addData(trades: _*)
    rIn.addData(quotes: _*)
    q.processAllAvailable()
    // push both watermarks past every trade so the aggregates finalize
    lIn.addData(Event(900, ts(2000), 9, "trade", 0.0))
    rIn.addData(Event(901, ts(2000), 9, "quote", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("c7p_sink")
      .select("l_event_id", "r_event_id", "r_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // batch oracle: full as-of join, then keep rows whose match is
    // within the horizon (the stream's bounded-state restriction)
    val batch = graft.operators.AsOf.asofJoin(
      trades.toDF(), quotes.toDF().select(col("user_id"),
        col("ts").as("q_ts"), col("ts").as("q_ts_p"),
        col("event_id").as("q_event_id"), col("value").as("q_value")),
      Seq("user_id"), "ts", "q_ts")
      .filter(col("q_event_id").isNotNull &&
        col("q_ts_p") >= col("ts") - expr("INTERVAL 1 hour"))
      .select("event_id", "q_event_id", "q_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == batch, s"stream=$got batch=$batch")
    // trade 102 at t=90 sees quote 203 (t=80), not the older 202;
    // trade 104 at t=500 has no quote within 1h and is absent
    assert(got.contains((102L, 203L, 1.3)))
    assert(!got.exists(_._1 == 104L))
  }

  test("C1 file stream source reads events-schema parquet incrementally") {
    val events = Tables.t(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft-stream-src").toString
    events.limit(200).write.mode("overwrite").parquet(dir)
    val q = EventStreams.fileSource(spark, dir, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("c1_sink")
      .option("checkpointLocation", chk()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("c1_sink").count() == 200)
  }

  test("C2 tumbling window agg + watermark over a memory stream") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.tumbling(input.toDF(), width = "1 hour", delay = "2 hours")
      .writeStream.format("memory").queryName("c2_sink")
      .outputMode("complete")
      .option("checkpointLocation", chk()).start()
    input.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.5))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("c2_sink")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq(java.sql.Timestamp.from(ts(0)), "click", 2L, 3.0),
      Seq(java.sql.Timestamp.from(ts(60)), "view", 1L, 3.5)))
  }

  test("C3 streaming sessionization emits gap-closed sessions") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionizeStream(input.toDS(), delay = "10 minutes")
      .writeStream.format("memory").queryName("c3_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    // session A: minutes 0..10; 40-min gap; session B starts at minute 50.
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "click", 2.0))
    q.processAllAvailable()
    input.addData(Event(3, ts(50), 7, "view", 4.0))
    q.processAllAvailable()
    // advance watermark far past B's gap so its event-time timeout fires
    input.addData(Event(4, ts(300), 8, "click", 0.5))
    q.processAllAvailable()
    input.addData(Event(5, ts(400), 9, "click", 0.25))
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("c3_sink")
      .select("user_id", "n_events", "sum_value").collect().map(_.toSeq).toSet
    assert(sessions.contains(Seq(7L, 2L, 3.0)), s"gap-closed session missing: $sessions")
    assert(sessions.contains(Seq(7L, 1L, 4.0)), s"timeout-closed session missing: $sessions")
  }

  test("regression: late-but-within-watermark event does not merge forward") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionizeStream(input.toDS(), delay = "3 hours")
      .writeStream.format("memory").queryName("c3late_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(Event(1, ts(100), 5, "click", 1.0))
    q.processAllAvailable()
    // 50 min BEFORE the open session's start, gap 30 min -> own session
    input.addData(Event(2, ts(50), 5, "click", 2.0))
    q.processAllAvailable()
    input.addData(Event(3, ts(900), 6, "flush", 0.0)) // advance watermark
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("c3late_sink").filter($"user_id" === 5L)
      .select("n_events", "sum_value").collect().map(_.toSeq).toSet
    assert(sessions == Set(Seq(1L, 2.0), Seq(1L, 1.0)),
      s"late event must form its own earlier session: $sessions")
  }

  test("regression: multiple late events fold into one earlier session; bridging late chain merges") {
    import graft.streaming.{EventStreams, OpenSession}
    def ev(id: Long, min: Int) = Event(id, ts(min), 9, "e", 1.0)
    val gap = EventStreams.SessionGapMicros
    def us(min: Int) = ts(min).getEpochSecond * 1000000L
    // carried session at [100, 100]; late events 40 and 50 (gap 30min)
    val carried = Some(OpenSession(us(100), us(100), 1, 100))
    val (closed1, open1) =
      EventStreams.foldSessions(Seq(ev(1, 40), ev(2, 50)), carried, gap)
    assert(closed1.map(s => (s.n_events, s.session_start)) ==
      Seq((2L, ts(40))),
      s"two late events within gap must form ONE earlier session: $closed1")
    assert(open1.map(_.startMicros) == Some(us(100)))
    // late chain ending at 79 bridges the 100-start session -> one merged
    val (closed2, open2) =
      EventStreams.foldSessions(Seq(ev(1, 60), ev(2, 79)), carried, gap)
    assert(closed2.isEmpty && open2 == Some(OpenSession(us(60), us(100), 3, 300)),
      s"bridging late chain must merge: $closed2 / $open2")
  }

  test("C3 stream and batch sessionization agree (shared core)") {
    val events = Tables.t(spark, sfDir, "events").limit(300)
    val batch = EventStreams.sessionizeBatch(events)
      .collect().map(s => (s.user_id, s.session_start, s.n_events, s.sum_value)).toSet
    // replay the same events through the streaming path in one batch,
    // then a far-future event per-user-free to flush all timeouts
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionizeStream(input.toDS(), delay = "1 minute")
      .writeStream.format("memory").queryName("c3b_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq)
    q.processAllAvailable()
    input.addData(Event(-1, Instant.parse("2030-01-01T00:00:00Z"), -1, "x", 0.0))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("c3b_sink")
      .filter($"user_id" =!= -1L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toInstant,
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch,
      s"stream/batch divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("C4 stream-static join enriches with broadcast dim") {
    val input = MemoryStream[Event](spark)
    val dim = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val q = EventStreams.withDim(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("c4_sink")
      .option("checkpointLocation", chk()).start()
    input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 3, "view", 2.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("c4_sink").select("user_id", "tier")
      .collect().map(_.toSeq).toSet
    assert(out == Set(Seq(1L, "gold"), Seq(3L, null)))
  }

  test("parquet sink persists the stream; compaction merges the per-trigger files") {
    val input = MemoryStream[Event](spark)
    val out = Files.createTempDirectory("graft-sink").toString + "/events"
    val q = graft.streaming.EventStreams.toParquetSink(
      input.toDF(), out, chk())
    for (i <- 1 to 5) {
      input.addData(Event(i, ts(i), 1, "click", i.toDouble))
      q.processAllAvailable()
    }
    q.stop()
    assert(spark.read.parquet(out).count() == 5)
    // a live sink dir must be refused (its _spark_metadata log governs
    // visibility); decommissioning = stop stream + drop the log
    assertThrows[IllegalArgumentException](
      graft.sources.Compaction.compact(spark, out))
    val meta = java.nio.file.Paths.get(out, "_spark_metadata")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(meta).sorted(java.util.Comparator.reverseOrder())
      .iterator.asScala.foreach(java.nio.file.Files.delete)
    val (before, after) = graft.sources.Compaction.compact(spark, out)
    assert(before == 5 && after == 1, s"expected 5 -> 1 files, got $before -> $after")
    assert(spark.read.parquet(out).count() == 5, "compaction must preserve rows")
  }

  test("C7 stream-stream join pairs events within the time bound only") {
    val purchases = MemoryStream[Event](spark)
    val views = MemoryStream[Event](spark)
    val joined = graft.streaming.EventStreams.withinJoin(
      purchases.toDF(), views.toDF(), "user_id", within = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("c7_sink")
      .option("checkpointLocation", chk()).start()
    views.addData(
      Event(10, ts(0), 1, "view", 1.0),    // 40 min before -> outside bound
      Event(11, ts(30), 1, "view", 2.0),   // 10 min before -> inside
      Event(12, ts(45), 1, "view", 3.0),   // 5 min AFTER   -> excluded
      Event(13, ts(35), 2, "view", 4.0))   // other user    -> excluded
    purchases.addData(Event(20, ts(40), 1, "purchase", 9.0))
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("c7_sink")
      .select("l_event_id", "r_event_id").collect().map(_.toSeq).toSet
    assert(pairs == Set(Seq(20L, 11L)), s"got $pairs")
  }

  test("C13 streaming model scoring == batch scoreWithModel on the same docs") {
    import graft.operators.NbQuality
    // training corpus: clearly separated classes (the NbQualitySpec corpus)
    val train = Seq(
      (1L, (0 until 60).map(i => s"w$i").mkString(" ")),
      (2L, ((0 until 55).map(i => s"v$i") :+ "shared").mkString(" ")),
      (3L, "shared x x shared"),
      (4L, (0 until 60).map(_ => "y").mkString(" "))
    ).toDF("doc_id", "text")
    val (model, consts) = NbQuality.trainModel(train, "doc_id", "text")
    // scoring stream: one reference-shaped doc, one junk doc, one doc
    // full of OOV tokens (pays only the smoothing denominator)
    val docs = Seq(
      StreamDoc(10, ts(0), (0 until 50).map(i => s"w$i").mkString(" ")),
      StreamDoc(11, ts(5), "shared x shared x"),
      StreamDoc(12, ts(9), "zz qq zz qq zz"))
    val input = MemoryStream[StreamDoc](spark)
    val q = EventStreams.scoreStream(input.toDF(), model, consts)
      .writeStream.format("memory").queryName("c13_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(docs: _*)
    q.processAllAvailable()
    input.addData(StreamDoc(99, ts(2000), "watermark advancing sentinel document"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("c13_sink")
      .select("doc_id", "n_toks", "logodds_scaled", "predicted_keep")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val want = NbQuality.scoreWithModel(
        docs.toDF().select(col("doc_id"), col("text")), "doc_id", "text",
        model, consts)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.view.filterKeys(_ != 99L).toMap ==
      want.view.filterKeys(_ != 99L).toMap, s"stream=$got batch=$want")
    assert(got(10L)._3 && !got(11L)._3, "separated classes must score apart")
  }

  test("C13b scoreWithModel on the training corpus reproduces nbLogOdds") {
    import graft.operators.NbQuality
    val train = Seq(
      (1L, (0 until 60).map(i => s"w$i").mkString(" ")),
      (2L, ((0 until 55).map(i => s"v$i") :+ "shared").mkString(" ")),
      (3L, "shared x x shared"),
      (4L, (0 until 60).map(_ => "y").mkString(" "))
    ).toDF("doc_id", "text")
    val (model, consts) = NbQuality.trainModel(train, "doc_id", "text")
    val scored = NbQuality.scoreWithModel(train, "doc_id", "text", model, consts)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val direct = NbQuality.nbLogOdds(train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scored == direct, s"scored=$scored direct=$direct")
  }

  test("C14 streaming dedup-against-history drops seen and in-stream dups") {
    import graft.functions.GraftFunctions.md5Prefix48
    val history = Seq((100L, "previously ingested document body"),
      (101L, "another old document")).toDF("doc_id", "text")
      .select(md5Prefix48(col("text")).as("h"))
    val docs = Seq(
      StreamDoc(1, ts(0), "previously ingested document body"), // historical dup
      StreamDoc(2, ts(1), "a genuinely new document"),
      StreamDoc(3, ts(2), "a genuinely new document"),          // in-stream dup of 2
      StreamDoc(4, ts(3), "another fresh document"))
    val input = MemoryStream[StreamDoc](spark)
    val q = EventStreams.dedupAgainstHistory(input.toDF(), history)
      .writeStream.format("memory").queryName("c14_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val kept = spark.table("c14_sink").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L), s"kept=$kept")
  }

  test("C15 streaming containment candidates == batch sketch/posting formulation") {
    import graft.functions.GraftFunctions.{md5Prefix48, textShingles, topKPairs}
    import graft.operators.Containment
    // corpus: a long host doc that QUOTES a short incoming doc verbatim
    // (the asymmetric pair jaccard misses), plus background docs
    val quote = "the sacred river ran through caverns measureless to man down to a sunless sea"
    val corpus = Seq(
      (100L, "in xanadu did kubla khan a stately pleasure dome decree where " +
        quote + " so twice five miles of fertile ground with walls and towers were girdled round"),
      (101L, "completely unrelated background document about stream state and watermarks expiry"),
      (102L, "another unrelated background document mentioning broadcast joins and shuffles"))
      .toDF("doc_id", "text")
    val posting = Containment.postingIndex(corpus, "doc_id", "text")
      .localCheckpoint()
    val docs = Seq(
      StreamDoc(1, ts(0), quote),                                // contained in 100
      StreamDoc(2, ts(1), "a fresh document sharing nothing with the corpus at all today"))
    val input = MemoryStream[StreamDoc](spark)
    val q = EventStreams.containmentCandidatesStream(input.toDF(), posting)
      .writeStream.format("memory").queryName("c15_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(docs: _*)
    q.processAllAvailable()
    input.addData(StreamDoc(99, ts(2000), "watermark advancing sentinel document with plenty of words here"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("c15_sink").select("doc_a", "doc_b", "m")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch reference: the ORIGINAL q83 bottom-k formulation (per-doc
    // topKPairs over the exploded shingle table — a different
    // implementation from the in-row fold) joined to the same posting
    val want = docs.toDF()
      .select(col("doc_id"),
        explode(textShingles(col("text"), 5)).as("gram"))
      .select(col("doc_id"), md5Prefix48(col("gram")).as("h")).distinct()
      .groupBy(col("doc_id"))
      .agg(topKPairs((-col("h")).cast("double"), col("h"), 16).as("top"))
      .select(col("doc_id").as("doc_a"), explode(col("top.id")).as("h"))
      .join(posting, Seq("h"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") >= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"stream=$got batch=$want")
    // the quoted doc IS surfaced against its host; the fresh doc is not
    assert(got.exists(p => p._1 == 1L && p._2 == 100L), s"got=$got")
    assert(!got.exists(_._1 == 2L))
  }

  test("C16 streaming PII scrub == batch projection, planted identifiers leave the edge") {
    import graft.operators.PiiScrub
    val docs = Seq(
      StreamDoc(1, ts(0), "contact alice.w+spam@mail.example.org or 555-123-4567 for details"),
      StreamDoc(2, ts(1), "server at 192.168.10.20 and fallback 2001:db8:85a3:0:0:8a2e:370:7334 are both reachable"),
      StreamDoc(3, ts(2), "a perfectly clean document with no identifiers in it at all"),
      StreamDoc(4, ts(3), "intl +44 20 7946 0958 pays with 4539-1488-0343-6467 never 4111 1111 1111 1112"))
    val input = MemoryStream[StreamDoc](spark)
    val q = EventStreams.scrubStream(input.toDF())
      .writeStream.format("memory").queryName("c16_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("c16_sink")
      .select("doc_id", "emails", "phones", "ips", "cards", "text")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5)))
      .toSet
    val want = docs.toDF()
      .select(col("doc_id"),
        regexp_count(col("text"), lit(PiiScrub.emailRe)).cast("long"),
        (regexp_count(col("text"), lit(PiiScrub.phoneRe)) +
          regexp_count(col("text"), lit(PiiScrub.intlPhoneRe))).cast("long"),
        (regexp_count(col("text"), lit(PiiScrub.ipv4Re)) +
          regexp_count(col("text"), lit(PiiScrub.ipv6Re))).cast("long"),
        PiiScrub.luhnCardCountRegex("text").cast("long"),
        PiiScrub.redactRegex(col("text")))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5)))
      .toSet
    assert(got == want, s"stream=$got batch=$want")
    // the scrubbed stream carries placeholders, never the identifiers
    assert(got.exists(r => r._1 == 1L && r._6 ==
      "contact [EMAIL] or [PHONE] for details"))
    assert(got.exists(r => r._1 == 2L && r._6 ==
      "server at [IP] and fallback [IPV6] are both reachable"))
    assert(got.exists(r => r._1 == 3L && r._2 == 0L && r._6 ==
      "a perfectly clean document with no identifiers in it at all"))
    // both card-shaped runs leave the text, only the Luhn-valid one counts
    assert(got.exists(r => r._1 == 4L && r._5 == 1L && r._6 ==
      "intl [PHONE] pays with [CARD] never [CARD]"))
  }

  test("C20 streaming curation funnel: per-window gate counts == batch replay on the same docs") {
    import graft.functions.GraftFunctions.{md5Prefix48, textShingles}
    val longClean = (1 to 60).map(i => s"w$i").mkString(" ") +
      " the a of and to"
    val dupText = "this exact document already lives in the corpus " +
      (1 to 45).map(i => s"d$i").mkString(" ")
    val benchText = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima"
    val contaminated = "prefix words then " +
      "alpha bravo charlie delta echo foxtrot golf hotel" +
      " and unrelated tail content"
    val piiDoc = "contact someone@example.com for details"
    val shortDoc = "just a few words"
    val docs = Seq(
      StreamLangDoc(1, ts(1), longClean, "en"),
      StreamLangDoc(2, ts(2), piiDoc, "en"),
      StreamLangDoc(3, ts(3), dupText, "en"),
      StreamLangDoc(4, ts(12), contaminated, "en"),
      StreamLangDoc(5, ts(13), shortDoc, "en"),
      StreamLangDoc(6, ts(14), longClean, "de"),
      // sentinel: advances the watermark past both windows; its own
      // window stays open and must NOT be emitted
      StreamLangDoc(99, ts(300), "watermark sentinel words", "en"))
    val seen = Seq(dupText).toDF("text")
      .select(md5Prefix48(col("text")).as("h"))
    val bench = Seq(benchText).toDF("text")
      .select(explode(textShingles(col("text"), 8)).as("gram"))

    val input = MemoryStream[StreamLangDoc](spark)
    val q = EventStreams.curationFunnelStream(input.toDF(), seen, bench,
        window = "10 minutes", delay = "2 minutes")
      .writeStream.format("memory").queryName("c20_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(docs.take(3): _*)
    q.processAllAvailable()
    input.addData(docs.slice(3, 6): _*)
    q.processAllAvailable()
    // the sentinel advances the watermark; one more empty-ish trigger
    // lets the finalized windows flush
    input.addData(docs.last)
    q.processAllAvailable()
    input.addData(StreamLangDoc(100, ts(400), "second sentinel words", "en"))
    q.processAllAvailable(); q.stop()
    // the second sentinel legitimately closes the first sentinel's own
    // window too — the pin compares the two planted windows
    val got = spark.table("c20_sink")
      .filter(col("win_start") < lit(java.sql.Timestamp.from(ts(20))))
      .collect().map(_.toSeq).toSet

    // batch replay: the SAME operator on a static frame (watermark is a
    // no-op in batch), restricted to the two closed windows
    val want = EventStreams.curationFunnelStream(docs.toDF(), seen, bench,
        window = "10 minutes", delay = "2 minutes")
      .filter(col("win_start") < lit(java.sql.Timestamp.from(ts(20))))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"stream=$got batch=$want")
    assert(got.size == 10, "two closed windows x five gates")
    // spot pins: the pii plant and the seen-hash dup land in window 0,
    // the bench 8-gram overlap in window 1
    def flagged(win: Int, gate: String): Long = got.collectFirst {
      case Seq(w: java.sql.Timestamp, g: String, _, f: Long, _)
        if g == gate && w == java.sql.Timestamp.from(ts(win)) => f
    }.get
    assert(flagged(0, "pii") == 1L)
    assert(flagged(0, "dedup_exact") == 1L)
    assert(flagged(0, "contamination") == 0L)
    assert(flagged(10, "contamination") == 1L)
    // the contaminated doc is also short, so quality flags it AND the
    // short doc
    assert(flagged(10, "quality") == 2L)
    assert(flagged(10, "langid") >= 1L, "the de-recorded english doc must flag")
  }

  test("C5 streaming dedup drops duplicate event_ids within watermark") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.dedup(input.toDF())
      .writeStream.format("memory").queryName("c5_sink")
      .option("checkpointLocation", chk()).start()
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "view", 2.0))
    q.processAllAvailable()
    input.addData(Event(1, ts(2), 1, "click", 1.0)) // late duplicate
    q.processAllAvailable(); q.stop()
    assert(spark.table("c5_sink").count() == 2)
  }

  test("C22 ExactSubstr spans at the ingest edge: corpus-duplicated spans flagged with exact extents") {
    import graft.operators.ExactSubstr
    import SparkFixture.spark.implicits._
    def words(p: String, n: Int): Seq[String] = (0 until n).map(i => s"$p$i")
    val run = words("r", 20)   // a 20-token span living in the corpus
    val run2 = words("s", 15)  // a second, separate corpus span
    val corpus = Seq(
      (100L, (words("c", 5) ++ run ++ words("d", 8)).mkString(" ")),
      (101L, (run2 ++ words("e", 10)).mkString(" "))).toDF("doc_id", "text")
    val fpIndex = ExactSubstr
      .fingerprintIndex(corpus, "text", minTokens = 15)
    val docs = Seq(
      // shares the 20-token run -> ONE span, exactly 20 tokens covered
      StreamDoc(1, ts(0), (words("a", 3) ++ run ++ words("b", 6)).mkString(" ")),
      // shares BOTH corpus spans, far apart -> two spans, 35 tokens
      StreamDoc(2, ts(1), (run ++ words("x", 16) ++ run2).mkString(" ")),
      // fresh content, nothing in the corpus -> absent from the output
      StreamDoc(3, ts(2), words("z", 40).mkString(" ")))
    val input = MemoryStream[StreamDoc](spark)
    val q = EventStreams.exactSubstrSpanStream(input.toDF(), fpIndex)
      .writeStream.format("memory").queryName("c22_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    input.addData(docs: _*)
    q.processAllAvailable()
    input.addData(StreamDoc(99, ts(2000),
      "watermark advancing sentinel document with plenty of words here"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("c22_sink")
      .select("doc_id", "n_dup", "n_spans", "dup_tokens")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: windows at positions 3..8 inside the copied run (6 windows),
    // one span, coverage exactly the 20 copied tokens
    assert(rows(1L) == ((6L, 1L, 20L)), rows.toString)
    // doc 2: run at 0..5 (6 windows) + run2 at 36 (1 window), gap 36 > 15
    // -> two spans, 20 + 15 tokens covered
    assert(rows(2L) == ((7L, 2L, 35L)), rows.toString)
    assert(!rows.contains(3L), "fresh content must not be flagged")
    assert(!rows.contains(99L))
  }
}
