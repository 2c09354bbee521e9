package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** One event of the driver's `events` table (µs-precision Instant so
  * stream/batch/DuckDB all compare timestamps at full parquet precision).
  */
case class Event(event_id: Long, ts: Instant, user_id: Long,
                 event_type: String, value: Double)

/** A closed user session. `sum_value` is quantized (cents) before
  * accumulation so the sum is order-independent — the same trick as
  * Q.dsum, needed because streaming accumulation order is arbitrary.
  */
case class Session(user_id: Long, session_start: Instant, session_end: Instant,
                   n_events: Long, sum_value: Double)

/** Open-session accumulator carried in stream state. */
case class OpenSession(startMicros: Long, lastMicros: Long,
                       n: Long, sumCents: Long)

/** Structured-Streaming surface over the events schema (SURVEY.md §2.C).
  *
  * The reference has no stream processing (ebike is a batch OLAP server);
  * this is the scale-path addition: the same event analytics the batch
  * suite runs (q29/q40/q41), expressed as incremental queries with
  * watermarked state so they run unbounded on a cluster. Batch and stream
  * share one sessionization core (`foldSessions`), which is what lets the
  * driver oracle the streaming semantics with a window-gap SQL batch
  * equivalent.
  */
object EventStreams {

  val eventSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")

  /** Default session gap and watermark delay. */
  val SessionGap = "30 minutes"
  val SessionGapMicros: Long = 30L * 60 * 1000 * 1000

  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  private def instant(us: Long): Instant =
    Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)

  // ---- C1: sources -------------------------------------------------------

  /** File stream over a directory of events-schema parquet — the
    * production shape: a 1000-executor cluster tails an object-store
    * prefix; `maxFilesPerTrigger` bounds per-batch work.
    */
  def fileSource(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  // ---- C2: windowed aggregation + watermark ------------------------------

  /** Tumbling 1-hour counts/sums per event type. Watermark bounds state:
    * windows older than `delay` behind max event time are finalized and
    * dropped, so state size is O(active windows), not O(stream length).
    */
  def tumbling(events: DataFrame, width: String = "1 hour",
               delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window variant (1h window every 15min). */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "15 minutes", delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  // ---- C3: sessionization ------------------------------------------------

  /** Fold time-ordered events into gap-separated sessions. Shared by the
    * streaming path (per-microbatch, with carried state) and the batch
    * path (one call per user with all events) — a single definition of
    * the session semantics keeps the two modes provably consistent.
    *
    * Returns (closed sessions in start order, still-open accumulator).
    */
  def foldSessions(events: Seq[Event], open0: Option[OpenSession],
                   gapMicros: Long): (Seq[Session], Option[OpenSession]) = {
    val closed = Seq.newBuilder[Session]
    var open = open0
    // Accumulator for late events that precede the carried session
    // (cross-batch disorder). Late events fold amongst THEMSELVES with
    // normal gap semantics; when the late chain reaches within the gap
    // of the carried session's start, the two merge — exactly what the
    // batch fold over the union would produce. Without this, a late
    // event's negative t - lastMicros always passes the gap test and it
    // silently merges into a session that started after it.
    var late: Option[OpenSession] = None
    var userId = 0L

    def resolveLate(o: OpenSession): OpenSession = late match {
      case Some(l) =>
        late = None
        if (o.startMicros - l.lastMicros <= gapMicros)
          OpenSession(l.startMicros, o.lastMicros, o.n + l.n,
            o.sumCents + l.sumCents)
        else { closed += close(userId, l); o }
      case None => o
    }

    for (e <- events.sortBy(ev => (micros(ev.ts), ev.event_id))) {
      val t = micros(e.ts)
      val cents = math.round(e.value * 100)
      userId = e.user_id
      open match {
        case Some(o) if t < o.startMicros =>
          late match {
            case Some(l) if t - l.lastMicros <= gapMicros =>
              late = Some(l.copy(lastMicros = t, n = l.n + 1,
                sumCents = l.sumCents + cents))
            case Some(l) =>
              closed += close(e.user_id, l)
              late = Some(OpenSession(t, t, 1, cents))
            case None =>
              late = Some(OpenSession(t, t, 1, cents))
          }
        case Some(o0) =>
          // forward region: settle the late chain first (sorted order
          // means no further late events can precede o's start)
          val o = resolveLate(o0)
          open = Some(o)
          if (t - o.lastMicros <= gapMicros)
            open = Some(o.copy(lastMicros = math.max(o.lastMicros, t),
              n = o.n + 1, sumCents = o.sumCents + cents))
          else {
            closed += close(e.user_id, o)
            open = Some(OpenSession(t, t, 1, cents))
          }
        case None =>
          open = Some(OpenSession(t, t, 1, cents))
      }
    }
    open = open.map(resolveLate)
    (closed.result(), open)
  }

  private def close(userId: Long, o: OpenSession): Session =
    Session(userId, instant(o.startMicros), instant(o.lastMicros),
      o.n, o.sumCents / 100.0)

  /** Streaming sessionization: append-mode flatMapGroupsWithState keyed by
    * user. State = one OpenSession per active user (bounded by the
    * watermark timeout, set to last-event + gap); sessions emit when the
    * gap is exceeded by a later event or the event-time timeout fires.
    */
  def sessionizeStream(events: Dataset[Event],
                       delay: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val done = state.getOption.map(close(userId, _))
            state.remove()
            done.iterator
          } else {
            val (closedSessions, open) =
              foldSessions(it.toSeq, state.getOption, SessionGapMicros)
            open match {
              case Some(o) =>
                state.update(o)
                state.setTimeoutTimestamp((o.lastMicros / 1000L) +
                  SessionGapMicros / 1000L)
              case None => state.remove()
            }
            closedSessions.iterator
          }
      }
  }

  /** Batch sessionization over the same core — this is q41's plan. One
    * shuffle on user_id; each user's events fold in one task (skew-safe:
    * per-user event counts are human-scale, not power-law unbounded).
    */
  def sessionizeBatch(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, it: Iterator[Event]) =>
        val (closedSessions, open) =
          foldSessions(it.toSeq, None, SessionGapMicros)
        (closedSessions ++ open.map(close(userId, _))).iterator
      }
  }

  // ---- C4: stream-static join -------------------------------------------

  /** Enrich the stream with a static dimension (broadcast — the static
    * side is planned per-microbatch exactly like a batch broadcast join,
    * no stream-state).
    */
  def withDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  // ---- C7: stream-stream join --------------------------------------------

  /** Watermarked stream-stream inner join: each left event pairs with
    * right events of the same key whose ts falls within `within` BEFORE
    * the left ts. Both sides carry watermarks and the join has a
    * two-sided time bound, so Spark can expire buffered state — without
    * the bound, stream-stream join state grows without limit.
    */
  def withinJoin(left: DataFrame, right: DataFrame, key: String,
                 within: String = "1 hour",
                 delay: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", delay)
      .select(col(key), col("ts").as("l_ts"),
        col("event_id").as("l_event_id"), col("value").as("l_value"))
    val r = right.withWatermark("ts", delay)
      .select(col(key).as("_rk"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("value").as("r_value"))
    l.join(r,
      col(key) === col("_rk") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $within") &&
        col("r_ts") <= col("l_ts"))
      .drop("_rk")
  }

  // ---- sink ---------------------------------------------------------------

  /** Append-mode parquet sink with checkpointing — the durable end of the
    * pipeline (object-store prefix in production). Streaming appends
    * produce per-trigger files; once a sink dir is decommissioned (stream
    * stopped, `_spark_metadata` log removed — the dir becomes a plain
    * table), `graft.sources.Compaction` rewrites them to scan-sized
    * files. Compaction refuses LIVE sink dirs: rewriting files the sink
    * log still governs would hide rows from readers.
    */
  def toParquetSink(df: DataFrame, path: String,
                    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .start()

  // ---- C5: streaming dedup ----------------------------------------------

  /** Exactly-once by event_id within the watermark horizon: state keeps
    * one key per event inside the delay window and is dropped beyond it —
    * bounded state for an unbounded stream.
    */
  def dedup(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  // ---- C5+: streaming NEAR-dup candidates (MinHash band keys) ------------

  /** Near-duplicate candidate pairs on a document stream: each doc
    * explodes to its MinHash LSH band keys (same native kernel and 32×2
    * banding as batch q31), and a watermarked stream-stream self-join on
    * the band key emits pairs whose event times fall within `within` of
    * each other. Band state expires with the watermark, so an unbounded
    * stream keeps bounded state — the streaming face of Dedup
    * .minhashPairs, restricted to a time horizon (unbounded lookback
    * cannot have bounded state). A second stateful op
    * (dropDuplicatesWithinWatermark) collapses multi-band hits to one row
    * per pair.
    */
  def nearDupPairsStream(docs: DataFrame, within: String = "1 hour",
                         delay: String = "2 hours"): DataFrame = {
    import graft.functions.GraftFunctions.{minhashBandKeys, textShingles}
    def banded(p: String): DataFrame = docs
      .withWatermark("ts", delay)
      .select(col("doc_id").as(s"${p}_id"), col("ts").as(s"${p}_ts"),
        explode(minhashBandKeys(textShingles(col("text"), 5)))
          .as(s"${p}_band"))
    banded("a").join(banded("b"),
      col("a_band") === col("b_band") && col("a_id") < col("b_id") &&
        col("b_ts") >= col("a_ts") - expr(s"INTERVAL $within") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        col("a_ts").as("ts"))
      // the join's watermark propagates to `ts` — redefining it here is
      // an error under multiple-stateful-operator support
      .dropDuplicatesWithinWatermark("doc_a", "doc_b")
  }

  /** Batch face of `nearDupPairsStream` on the same frame shape — used by
    * the spec to pin stream == batch on identical data.
    */
  def nearDupPairsBatch(docs: DataFrame, within: String = "1 hour"): DataFrame = {
    import graft.functions.GraftFunctions.{minhashBandKeys, textShingles}
    def banded(p: String): DataFrame = docs
      .select(col("doc_id").as(s"${p}_id"), col("ts").as(s"${p}_ts"),
        explode(minhashBandKeys(textShingles(col("text"), 5)))
          .as(s"${p}_band"))
    banded("a").join(banded("b"),
      col("a_band") === col("b_band") && col("a_id") < col("b_id") &&
        col("b_ts") >= col("a_ts") - expr(s"INTERVAL $within") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
      .distinct()
  }

  // ---- C7+: stream-stream as-of join -------------------------------------

  /** Streaming backward as-of within a bounded horizon: each left event
    * picks the LATEST right event with r_ts in [l_ts - horizon, l_ts]
    * for the same key. Two chained stateful operators — the watermarked
    * interval join buffers right rows only inside the horizon, and a
    * max_by aggregate keyed by the left event finalizes once the
    * watermark passes l_ts (no earlier right row can still arrive). The
    * horizon bound is what batch as-of doesn't need but bounded state
    * demands; left rows with no right match inside it are omitted.
    */
  def asOfStream(left: DataFrame, right: DataFrame, key: String,
                 horizon: String = "1 hour",
                 delay: String = "2 hours"): DataFrame =
    withinJoin(left, right, key, horizon, delay)
      // the join's watermark propagates to l_ts; the aggregate finalizes
      // a left row once the watermark passes it
      .groupBy(col("l_event_id"), col(key), col("l_ts"), col("l_value"))
      .agg(max_by(
        struct(col("r_ts"), col("r_event_id"), col("r_value")),
        struct(col("r_ts"), col("r_event_id"))).as("q"))
      .select(col("l_event_id"), col(key), col("l_ts"), col("l_value"),
        col("q.r_event_id").as("r_event_id"), col("q.r_ts").as("r_ts"),
        col("q.r_value").as("r_value"))

  /** Streaming benchmark decontamination (the stream face of D19/q56):
    * each incoming document is checked against a STATIC benchmark-gram
    * index — a stream-static equi-join Spark plans as a broadcast per
    * micro-batch, so the stream side never shuffles and no state
    * accrues (eval suites stay small at any corpus scale). Emits
    * (doc_id, ts, n_hits) for contaminated documents only; the
    * gate-keeping form (`left_anti`) drops them instead.
    */
  def contaminationStream(docs: DataFrame, benchGrams: DataFrame,
                          gramK: Int = 8, delay: String = "2 hours"): DataFrame = {
    import graft.functions.GraftFunctions.textShingles
    // grouping includes the event-time column, so the per-doc aggregate
    // finalizes in append mode once the watermark passes its ts and its
    // state expires — a doc's grams all arrive in its own row anyway
    docs
      .withWatermark("ts", delay)
      .select(col("doc_id"), col("ts"),
        explode(textShingles(col("text"), gramK)).as("gram"))
      .join(broadcast(benchGrams.select(col("gram")).distinct()), Seq("gram"))
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_hits"))
  }

  // ---- C13: model scoring on ingest --------------------------------------

  /** Scores every incoming document under an already-trained NB quality
    * model (`NbQuality.trainModel`) — the fastText/DCLM production
    * split run as a stream: train once on the reference mix, score each
    * ingest micro-batch, gate on `predicted_keep` downstream. The
    * stream side explodes to tokens scan-locally, LEFT-joins the STATIC
    * token-keyed weight table (stream-static joins are stateless — no
    * watermark state accrues on the join; the static side is re-planned
    * per micro-batch, and a small model broadcasts), and the per-doc
    * rollup keyed by (doc_id, ts) finalizes in append mode as the
    * watermark passes (the C12 pattern). OOV tokens contribute ln(1)=0
    * but still pay the smoothing denominator — identical semantics to
    * `NbQuality.scoreWithModel`, which StreamingSpec pins stream ==
    * batch against. Consts ride as literals (collected once at train
    * time), so the streaming plan carries no one-row cross join.
    */
  def scoreStream(docs: DataFrame, model: DataFrame,
                  consts: graft.operators.NbConsts,
                  delay: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", delay)
      .select(col("doc_id"), col("ts"),
        explode(split(col("text"), " ")).as("tok"))
      .join(model, Seq("tok"), "left")
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("q1p"), lit(0L)) -
          coalesce(col("q1n"), lit(0L))).as("s1"))
      .select(col("doc_id"), col("ts"), col("n_toks"),
        (col("s1") - col("n_toks") * lit(consts.q2p - consts.q2n) +
          lit(consts.q3p - consts.q3n)).as("logodds_scaled"),
        (col("s1") - col("n_toks") * lit(consts.q2p - consts.q2n) +
          lit(consts.q3p - consts.q3n) > 0L).as("predicted_keep"))

  // ---- C14: dedup against the historical corpus --------------------------

  /** Ingest-time exact dedup against everything ALREADY ingested: drops
    * an incoming doc if its content hash appears in the static `seen`
    * index (one `h` BIGINT column — md5₄₈ of text, the q30 key), and
    * collapses duplicates WITHIN the stream via
    * dropDuplicatesWithinWatermark (bounded state). The historical
    * check is a stream-static LEFT OUTER join + null filter — the
    * anti-join shape expressed through the supported stream-static
    * join types; Spark broadcasts or shuffles the static side by size,
    * and the stream side never accumulates join state. At 100 TB the
    * seen-index is a parquet table maintained by the batch dedup pass
    * (q30's groups are exactly its rows) and re-snapshot per
    * micro-batch — the standing lambda-architecture split between the
    * batch corpus and its ingest edge.
    *
    * CONTRACT: `seen` must be key-unique on `h` (one row per content
    * hash — q30's groups are, by construction: `h` is their GROUP BY
    * key). The operator deliberately does NOT re-deduplicate it: a
    * defensive distinct() here would re-shuffle the ENTIRE historical
    * index on every micro-batch re-plan — at 100 TB seen-index scale
    * that full-index exchange would dominate per-batch latency, paid
    * for rows the maintainer already made unique. (A duplicate `h` in
    * a non-conforming index would only duplicate dropped-row work, not
    * emit wrong rows — the join's matches are all filtered out — but
    * the contract keeps the plan honest.)
    */
  def dedupAgainstHistory(docs: DataFrame, seen: DataFrame,
                          delay: String = "2 hours"): DataFrame = {
    import graft.functions.GraftFunctions.md5Prefix48
    docs
      .withWatermark("ts", delay)
      .withColumn("h", md5Prefix48(col("text")))
      .dropDuplicatesWithinWatermark("h")
      .join(seen.select(col("h")).withColumn("_seen", lit(1)),
        Seq("h"), "left_outer")
      .filter(col("_seen").isNull)
      .drop("_seen", "h")
  }

  // ---- C15: containment candidates at the ingest edge --------------------

  /** The streaming face of D30/q83 — is an incoming document CONTAINED
    * in (or a container of) something already in the corpus? The batch
    * dedup family's last member without an ingest edge: MinHash banding
    * (C9) misses quote-in-host pairs by construction (jaccard ≈ |A|/|B|
    * ≈ 0), so ingest pipelines run the containment sketch as its own
    * pass. Each incoming doc's bottom-k sketch is computed IN THE ROW
    * (Containment.bottomKSketch — a scan-local sorted-dedup fold, no
    * per-doc aggregation state; StreamingSpec pins it equal to the
    * batch topKPairs formulation), explodes to ≤ sketchK probe hashes,
    * and equi-joins the STATIC df-capped posting index
    * (`Containment.postingIndex` — the batch-maintained table, C14's
    * seen-index discipline). The stream-static join is stateless; the
    * df-cap bounds any probe hash to ≤ dfCap matches, so per-doc
    * candidates stay ≤ sketchK·dfCap at any corpus size (the q33
    * budget rule, unchanged at the ingest edge). The (doc, ts,
    * candidate) rollup finalizes in append mode as the watermark
    * passes (the C12 pattern). Emits candidate pairs with their sketch
    * match count m ≥ minMatch; exact verification joins back to the
    * batch shingle table downstream, exactly as in batch q83.
    */
  def containmentCandidatesStream(docs: DataFrame, posting: DataFrame,
                                  shingleK: Int = 5, sketchK: Int = 16,
                                  minMatch: Int = 8,
                                  delay: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", delay)
      .select(col("doc_id"), col("ts"),
        explode(graft.operators.Containment
          .bottomKSketch(col("text"), shingleK, sketchK)).as("h"))
      .join(posting, Seq("h"))
      .filter(col("doc_id") =!= col("doc_b"))
      .groupBy(col("doc_id"), col("ts"), col("doc_b"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") >= minMatch)
      .select(col("doc_id").as("doc_a"), col("ts"), col("doc_b"), col("m"))

  // ---- C22: ExactSubstr duplicate spans at the ingest edge ---------------

  /** The streaming face of D38/q95 — which token spans of an INCOMING
    * document already exist verbatim in the corpus? The Lee et al.
    * substring-dedup filter applied at ingest: each incoming doc's
    * overlapping window fingerprints are computed IN THE ROW (the same
    * one-pass `windowMd5s` kernel as the batch face — no aggregation
    * state), posexploded, and equi-joined against the STATIC corpus
    * fingerprint index (`ExactSubstr.fingerprintIndex` — the C14
    * seen-index discipline: batch-maintained, rebuilt with the corpus).
    * The stream-static join is stateless; the per-(doc, ts) rollup
    * finalizes in append mode as the watermark passes (the C12/C15
    * pattern), and the span merge runs SCAN-LOCALLY on the collected
    * position array (sorted positions ≤ L apart merge — the exact gap
    * algebra of the batch LAG merge, as HOFs over one row's array:
    * coverage = L + Σ min(gap, L), spans split where gap > L). Emits
    * (doc_id, ts, n_dup, n_spans, dup_tokens) for docs with ≥ 1
    * corpus-duplicated window; corpus-INTERNAL duplication stays the
    * batch face's job (q95), exactly as C14 leaves historical dedup to
    * the seen index it probes.
    */
  def exactSubstrSpanStream(docs: DataFrame, fpIndex: DataFrame,
                            minTokens: Int = 15,
                            delay: String = "2 hours"): DataFrame = {
    val L = minTokens
    val ps = col("ps")
    val gaps = zip_with(
      slice(ps, lit(2), size(ps) - 1),
      slice(ps, lit(1), size(ps) - 1),
      (a, b) => a - b)
    docs
      .withWatermark("ts", delay)
      .select(col("doc_id"), col("ts"),
        posexplode(graft.functions.GraftFunctions
          .windowMd5s(col("text"), L)).as(Seq("pos", "w")))
      .join(fpIndex.select(col("w")), Seq("w")) // stream-static, stateless
      .groupBy(col("doc_id"), col("ts"))
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("ps"))
      .select(col("doc_id"), col("ts"),
        size(ps).cast("long").as("n_dup"),
        (lit(1L) + size(filter(gaps, g => g > L)).cast("long")).as("n_spans"),
        (lit(L.toLong) + aggregate(gaps, lit(0L),
          (acc, g) => acc + least(g, lit(L.toLong)))).as("dup_tokens"))
  }

  // ---- C17: live MinHash index maintenance at the ingest edge ------------

  /** The index-maintenance half C9 was missing (round 10): C9 emits
    * near-dup candidates but probes a STATIC band index — a production
    * ingest pipeline needs the index itself to grow as documents land.
    * This is the scan-local projection that turns an incoming doc into
    * its ONE index row (doc_id, ts, sh, bks): shingle set + all band
    * keys computed IN THE ROW (textShingles / minhashBandKeys are
    * row-local kernels — no aggregation state, no watermark), docs too
    * short to shingle dropped exactly as the batch `Dedup.minhashIndex`
    * drops them. Feed the result into `GraftSession.ingestUpsert` on a
    * merge-on-read table (doc_id BIGINT PRIMARY KEY, ts TIMESTAMP,
    * sh ARRAY<STRING>, bks ARRAY<BIGINT>): re-ingesting a revised doc
    * REPLACES its row, so stale band keys of the old text leave the
    * index atomically — the array-per-doc layout is what makes the
    * upsert correct (a (doc_id, bk)-grained table would strand them).
    * Probing stays the batch path: `Dedup.minhashIndexFromLive` adapts
    * the table to `incrementalMinhashPairs`'s (shingles, bands) inputs
    * (the band equi-join explodes bks at read time, scan-local).
    * StreamingSpec pins: table content after N micro-batches ==
    * `Dedup.minhashIndex` of the latest doc versions, and probing the
    * live table == a full-corpus `minhashPairs` rebuild.
    */
  def minhashIndexStream(docs: DataFrame, shingleK: Int = 5): DataFrame = {
    import graft.functions.GraftFunctions.{minhashBandKeys, textShingles}
    docs
      .select(col("doc_id"), col("ts"),
        textShingles(col("text"), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("bks", minhashBandKeys(col("sh")))
  }

  // ---- C20: streaming curation-report funnel --------------------------------

  /** The streaming face of D36/q93 (round 11): per-WINDOW gate counts
    * over the ingest edge, so the curation report a data team reviews
    * is continuously current instead of a batch artifact. The
    * scan-local gates (pii / langid / quality) are the SHARED
    * `CurationGates` definitions q93 reads — stream == batch is
    * structural. The corpus-relative gates take their ingest-edge
    * forms: exact-dup probes the C14 seen-hash index (stream-static
    * left join, stateless), contamination probes the benchmark gram
    * set COLLAPSED TO ONE BROADCAST ARRAY ROW and tests
    * arrays_overlap(textShingles(text), bench) — scan-local, no
    * explode, no per-doc aggregation state (eval suites are small at
    * any corpus scale; a per-doc gram-join rollup would be a second
    * stateful operator for nothing). Near-dup at the edge is C15's own
    * candidate stream — it emits pairs, not a rate, and composes
    * downstream of this report by design.
    *
    * The ONE stateful operator is the final window rollup: conditional
    * sums keyed by window(ts), finalized in append mode as the
    * watermark passes (the C2 pattern), then exploded into
    * (win_start, gate, n_docs, n_flagged, flag_rate) rows — the q93
    * shape with a window column. State is O(open windows), bounded by
    * the watermark at any throughput.
    */
  def curationFunnelStream(docs: DataFrame, seenHashes: DataFrame,
                           benchGrams: DataFrame,
                           window: String = "10 minutes",
                           delay: String = "2 hours",
                           gramK: Int = 8): DataFrame = {
    import graft.functions.GraftFunctions.{md5Prefix48, textShingles}
    import graft.operators.CurationGates
    val benchArr = benchGrams.select(col("gram")).distinct()
      .agg(sort_array(collect_list(col("gram"))).as("bench"))
    val flagged = docs
      .withWatermark("ts", delay)
      .select(col("doc_id"), col("ts"),
        CurationGates.piiFlag(col("text")).as("fpii"),
        CurationGates.langFlag(col("text"), col("lang")).as("flang"),
        CurationGates.qualFlag(col("text")).as("fqual"),
        md5Prefix48(col("text")).as("h"),
        textShingles(col("text"), gramK).as("grams"))
      .join(seenHashes.select(col("h")).distinct() // static side: dedup once so a
        // duplicate h in the index can't multiply stream rows through the left join
        .withColumn("_seen", lit(1)),
        Seq("h"), "left_outer")
      .crossJoin(broadcast(benchArr))
      .select(col("ts"), col("fpii"), col("flang"), col("fqual"),
        col("_seen").isNotNull.as("fdup"),
        arrays_overlap(col("grams"), col("bench")).as("fcont"))
    flagged
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(count(lit(1)).as("n"),
        sum(when(col("fpii"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("flang"), 1L).otherwise(0L)).as("fl"),
        sum(when(col("fqual"), 1L).otherwise(0L)).as("fq"),
        sum(when(col("fdup"), 1L).otherwise(0L)).as("fd"),
        sum(when(col("fcont"), 1L).otherwise(0L)).as("fc"))
      .select(col("window.start").as("win_start"), explode(array(
        struct(lit("contamination").as("gate"), col("n").as("n_docs"),
          col("fc").as("n_flagged")),
        struct(lit("dedup_exact").as("gate"), col("n").as("n_docs"),
          col("fd").as("n_flagged")),
        struct(lit("langid").as("gate"), col("n").as("n_docs"),
          col("fl").as("n_flagged")),
        struct(lit("pii").as("gate"), col("n").as("n_docs"),
          col("fp").as("n_flagged")),
        struct(lit("quality").as("gate"), col("n").as("n_docs"),
          col("fq").as("n_flagged")))).as("g"))
      .select(col("win_start"), col("g.gate").as("gate"),
        col("g.n_docs").as("n_docs"), col("g.n_flagged").as("n_flagged"),
        (col("g.n_flagged").cast("double") / col("g.n_docs"))
          .as("flag_rate"))
  }

  // ---- C19: live embedding-index maintenance -------------------------------

  /** The ANN analogue of C17 (round 11 — SURVEY.md §2.C19): each
    * micro-batch of vectors is IVFADC-ENCODED at the ingest edge against
    * a FROZEN quantizer (coarse argmin → residual → PQ codes, ONE
    * scan-local projection — `IvfPq.encodeRows`, the exact code the
    * batch q86 path runs, so live == rebuild is structural) and upserted
    * into a (vec_id PK, cell, codes) catalog table by `ingestUpsert` —
    * a revised vec_id replaces its cell and codes atomically, exactly as
    * C17 replaces band keys. The maintained table IS the `enc` input of
    * `IvfPq.probeEncoded`: queries probe the live index without
    * re-encoding the corpus.
    *
    * The codebook itself persists as two catalog tables (the ix.coarse /
    * ix.pqCbR shapes) — a restart rebuilds the exact frozen quantizer
    * via `IvfPq.indexFromStored`, so encodes are bit-identical across
    * process lifetimes. CODEBOOK REFRESH is deliberately NOT an
    * ingest-edge concern: residual-PQ assignments are only comparable
    * under one quantizer, so a refresh (retrain on the grown corpus,
    * re-encode every vector) is an OPTIMIZE-style full rewrite through
    * the same upsert machinery — LiveIndexSpec pins refreshed ==
    * from-scratch rebuild under the new quantizer. Refresh vs ingest is
    * single-writer BY CONTRACT; if an ingest upsert races the refresh
    * (lands between retrain and re-encode), the pinned behavior is
    * last-writer-wins per key: snapshot keys take the refresh encode
    * (a racing revision is lost until re-ingested) and off-snapshot
    * keys keep OLD-quantizer codes — the STALE-CODES WINDOW, which is
    * exactly that set of upserts. A refresh must therefore end with a
    * catch-up pass re-encoding rows upserted since the retrain (or
    * quiesce ingest); LiveIndexSpec pins both the window and the
    * catch-up convergence. At 100 TB: the
    * encode is embarrassingly parallel (two one-row broadcast frames,
    * ∛n-bounded by the two-level variant when √n outgrows the broadcast
    * frontier), the upsert cost is the C17 merge-on-read path, and the
    * refresh is a full corpus re-encode — scheduled, not streamed.
    */
  def embeddingIndexStream(vecs: DataFrame,
                           ix: graft.operators.IvfPq.Index): DataFrame = {
    import graft.functions.GraftFunctions.quantize
    graft.operators.IvfPq.encodeRows(
      vecs.select(col("vec_id"), col("ts"),
        quantize(col("embedding")).as("qv")), ix, "qv")
      .select(col("vec_id"), col("ts"), col("cell"), col("codes"))
  }

  // ---- C21: LIVE SemDeDup cluster-assignment maintenance ------------------

  /** The streaming face of D21/q58 — the LAST static index made live
    * (round 13; C17 minhash bands, C18 postings, C19 IVFADC codes came
    * first): each micro-batch of vectors is labeled with its nearest
    * cluster under a FROZEN kmeans codebook (`Cluster.kmeansCodebook`'s
    * (c_id, c_qv) shape — ONE scan-local projection against the one-row
    * broadcast codebook, `Cluster.assignRows`, the exact code the batch
    * q57/q58 assignment runs, so live == rebuild is structural) and
    * upserted into a (vec_id PK, cluster) catalog table by
    * `ingestUpsert` — a revised vec_id replaces its cluster atomically.
    * The maintained table IS `Cluster.semDedupLabels`' labels input:
    * SemDeDup survivors compute from the live table without
    * re-clustering the corpus.
    *
    * The codebook persists as a catalog table (it literally is its own
    * (c_id, c_qv) frame) — a restart reads it back and labels
    * bit-identically. CODEBOOK REFRESH is deliberately NOT an
    * ingest-edge concern: cluster labels are only comparable under one
    * codebook, so a refresh (retrain on the grown corpus, re-assign
    * every vector) is an OPTIMIZE-style full rewrite through the same
    * upsert machinery — LiveIndexSpec pins refreshed == from-scratch
    * rebuild under the new codebook. Refresh vs ingest is single-writer
    * BY CONTRACT (C19's exact contract): if an ingest upsert races the
    * refresh (lands between retrain and re-assign), the behavior is
    * last-writer-wins per key — snapshot keys take the refresh label (a
    * racing revision is lost until re-ingested) and off-snapshot keys
    * keep OLD-codebook labels — the STALE-LABELS WINDOW, which is
    * exactly that set of upserts. A refresh must therefore end with a
    * catch-up pass re-assigning rows upserted since the retrain (or
    * quiesce ingest). At 100 TB: the assignment is embarrassingly
    * parallel (a √n-bounded one-row broadcast codebook), the upsert
    * cost is the C17 merge-on-read path, and the refresh is a full
    * corpus re-assign — scheduled, not streamed.
    */
  def clusterAssignStream(vecs: DataFrame, codebook: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.quantize
    graft.operators.Cluster.assignRows(
      vecs.select(col("vec_id"), col("ts"),
        quantize(col("embedding")).as("qv")), codebook, "qv")
      .select(col("vec_id"), col("ts"), col("cluster"))
  }

  // ---- C16: PII scrub at the ingest edge ----------------------------------

  /** The streaming face of D34/q89 — identifiers leave the text at the
    * ingest edge, BEFORE dedup hashes, model scoring, or storage ever
    * see them (the ordering every public pipeline enforces: a raw email
    * in one copy of a doc and a placeholder in another would even split
    * exact-dedup groups). Emits per-doc detection counts (the audit
    * numbers, on the raw text) alongside the redacted text.
    *
    * This is the ONE member of the ingest-edge family that needs no
    * state at all: detection and the email→phone→IPv4 chain are
    * scan-local projections (operators/PiiScrub.scala) — no watermark,
    * no join, no aggregation state, so the operator composes with any
    * downstream edge (feed `text` into C14's dedup or C13's scorer) at
    * any throughput; backpressure is the only coupling. StreamingSpec
    * pins stream == batch row-for-row, including planted PII.
    */
  def scrubStream(docs: DataFrame): DataFrame = {
    import graft.operators.PiiScrub
    // one kernel evaluation per row: project the scan struct first, then
    // unpack fields (round 11 — PiiScrub.piiScan carries the contract)
    docs.select(col("doc_id"), col("ts"),
        PiiScrub.piiScan(col("text")).as("_pii"))
      .select(col("doc_id"), col("ts"),
        col("_pii.emails").cast("long").as("emails"),
        col("_pii.phones").cast("long").as("phones"),
        col("_pii.ips").cast("long").as("ips"),
        col("_pii.cards").cast("long").as("cards"),
        col("_pii.red").as("text"))
  }
}
