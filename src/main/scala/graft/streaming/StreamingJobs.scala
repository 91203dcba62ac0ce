package graft.streaming

import graft.core.{BookTrade, OpenPos, PnlConfig, TradeBook}
import graft.operators.ExactNum
import org.apache.spark.sql.{DataFrame, Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming jobs (SURVEY §2 #29-30): the streaming twins of
  * the batch tumbling aggregation and of the MTM engine. Both run on any
  * DataFrame — batch or streaming — so batch/stream parity is a direct
  * spec assertion (StreamingSpec).
  */
object StreamingJobs {

  /** SURVEY #29: 1-hour tumbling-window counts/sums per event type with
    * a 2-hour watermark. In append mode a window emits once the
    * watermark passes its end — the standard bounded-state streaming
    * aggregation (state size = open windows × event types).
    */
  def tumblingAgg(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        ExactNum.sumExact(col("value"), 1e6).as("total_value"))
      .select(
        col("window.start").as("wstart"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Gap-based sessionization as a streaming aggregation — the streaming
    * twin of `Analytics.sessionize` (SURVEY §2 #15), via
    * `session_window`: windows merge while events arrive within `gap`
    * and emit once the watermark passes a session's close. The emitted
    * window end is (last event + gap), so `session_end - gap` equals the
    * batch twin's last-event timestamp (asserted in StreamingSpec).
    * State is O(open sessions per user) — bounded by the watermark.
    */
  def sessionAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        ExactNum.sumExact(col("value"), 1e6).as("session_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end_plus_gap"),
        col("n_events"), col("session_value"))

  /** Streaming corpus ingest — the streaming twin of
    * `CorpusPipeline.cleanCorpus` stages 0-2 (LLM-pipeline SURVEY block),
    * stage-for-stage behind the same flags: optional PII redaction
    * (stateless [[graft.functions.PiiRedact]] projection, BEFORE scoring
    * so every downstream stage sees the text that would ship — the batch
    * pipeline's documented order), optional Gopher-rules gate
    * ([[graft.operators.TextOps.gopherKeepExpr]], one fused
    * [[graft.functions.GopherStats]] scan), the scored quality gate
    * (fused [[graft.operators.TextOps.qualityExpr]] kernel), then
    * exact-dedup on the canonical normalized-text fingerprint with
    * `dropDuplicatesWithinWatermark` — dedup state is bounded by the
    * watermark horizon instead of growing with corpus size. Contract:
    * the first occurrence wins; a duplicate arriving within the horizon
    * is dropped; one arriving after state expiry is re-admitted as a new
    * document (the standard streaming-dedup tradeoff — at-most-once
    * dedup per horizon, exact batch dedup remains `Dedup.exactDups`).
    * The three text stages are all stateless single-scan projections /
    * filters, so results are chunking-invariant by construction
    * (StreamingSpec pins streamed == batch under any chunking).
    *
    * @param docs streaming frame with (ingest_ts timestamp, doc_id, text)
    */
  def corpusIngestStream(
      docs: DataFrame,
      minQuality: Double = 0.5,
      watermarkDelay: String = "2 hours",
      redactPii: Boolean = false,
      gopherRules: Boolean = false): DataFrame = {
    val redacted =
      if (!redactPii) docs
      else docs.withColumn(
        "text", graft.functions.PiiRedact.redacted(col("text")).getField("clean"))
    val gated =
      if (!gopherRules) redacted
      else redacted.filter(graft.operators.TextOps.gopherKeepExpr(col("text")))
    gated
      .withWatermark("ingest_ts", watermarkDelay)
      .withColumn("quality_score", graft.operators.TextOps.qualityExpr(col("text")))
      .filter(col("quality_score") >= minQuality)
      .withColumn("fp_md5", graft.operators.TextOps.fingerprintExpr(col("text")))
      .dropDuplicatesWithinWatermark("fp_md5")
  }

  /** Engine input bar (same canonical view as the batch engine). */
  final case class StreamBar(
      symbol: Long, ts_us: Long, event_id: Long, close: Double, buy: Int, sell: Int)

  /** Streamed timeline point. */
  final case class StreamPoint(symbol: Long, ts_us: Long, event_id: Long, mtm_ratio: Double)

  /** Serializable checkpoint of one symbol's book between micro-batches.
    * `(lastTsUs, lastEventId)` is the high-water mark of the symbol's
    * newest processed bar — `lastTsUs` anchors the idle-eviction timeout
    * and the flush price timestamp at eviction; the pair together guards
    * against cross-batch redelivery (an at-least-once source replaying a
    * bar AT the last processed timestamp must not re-step the book).
    */
  final case class BookState(
      prevClose: Double, hasPrev: Boolean, lastTsUs: Long, lastEventId: Long,
      longs: Seq[(Long, Double)], shorts: Seq[(Long, Double)])

  /** Streamed closed trade (the blotter's is_closed=true rows, plus
    * EVICTED flush rows for positions force-closed at state eviction).
    * Field order matches the batch blotter column order
    * (…, pnl_norm, pnl, close_reason) so positional consumers agree.
    * Open positions live in GroupState and surface only when closed or
    * evicted — append-mode streams cannot retract.
    */
  final case class StreamTrade(
      symbol: Long, direction: String, entry_ts_us: Long, entry_price: Double,
      exit_ts_us: Long, exit_price: Double, pnl_norm: Double, pnl: Double,
      close_reason: String)

  /** Default idle-eviction horizon: a symbol with no bars for 7 days of
    * EVENT time is flushed and its state dropped — the bound that keeps
    * the state store finite under unbounded key churn (user-id-like
    * symbol spaces). Reference semantics (trade_reward.py archive lists)
    * put no bound on symbols; a run-forever stream must.
    */
  val DefaultEvictAfterMs: Long = 7L * 24 * 3600 * 1000

  /** Watermarked, symbol-clustered, time-sorted group view of the bar
    * stream. The explicit `repartition` + `sortWithinPartitions` satisfy
    * the stateful operator's required distribution (hash on symbol,
    * shuffle-partition count) and required ordering ([symbol] is a
    * prefix of our [symbol, ts_us, event_id]), so the planner inserts no
    * second exchange/sort and each group's iterator arrives already in
    * time order — the group function can stream it lazily instead of
    * materializing the micro-batch group on-heap (StreamingSpec pins the
    * single Exchange+Sort shape).
    */
  private def orderedBySymbolTime(
      bars: Dataset[StreamBar], watermarkDelay: String): KeyValueGroupedDataset[Long, StreamBar] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val clustered = bars.toDF()
      .withColumn("et", timestamp_micros(col("ts_us")))
      .withWatermark("et", watermarkDelay)
      .repartition(col("symbol"))
    graft.plans.LocalSortHint(clustered, "symbol", "ts_us", "event_id")
      .groupBy(col("symbol")).as[Long, StreamBar]
  }

  /** Shared micro-batch group runner for both MTM streams: restore the
    * symbol's book + previous close from GroupState, step the batch's
    * bars feeding `emit`, snapshot back and arm the idle-eviction
    * timeout once the iterator drains. Heap is O(open positions) per
    * symbol: bars arrive (ts_us, event_id)-sorted from
    * [[orderedBySymbolTime]] and are consumed lazily; the state commit
    * rides the completion tail of the returned iterator (honored by the
    * stateful operator's completion callback). On timeout the group's
    * state is flushed through `onEvict` and removed. Contracts: (1) bars
    * must arrive in non-decreasing event-time order across batches for a
    * symbol (in-order source or upstream watermark+sort); (2) the
    * consumer must DRAIN each group's output fully — every built-in
    * streaming sink does — because a short-circuiting consumer (a
    * limit/take inside foreachBatch) would skip the commit tail and
    * lose the batch's state update for the cut-off groups. That is the
    * price of O(open-positions) heap; the eager alternative pays
    * O(micro-batch group) memory per task.
    */
  private def runSymbolBatch[T](
      cfg: PnlConfig, trackTrades: Boolean, streaming: Boolean, evictAfterMs: Long,
      it: Iterator[StreamBar], state: GroupState[BookState])(
      emit: (TradeBook, StreamBar, Double) => IterableOnce[T])(
      onEvict: BookState => Iterator[T]): Iterator[T] = {
    if (state.hasTimedOut) {
      // idle symbol: flush whatever is open, then drop the group
      val out = state.getOption.map(onEvict).getOrElse(Iterator.empty).toVector
      state.remove()
      out.iterator
    } else {
      val book = new TradeBook(cfg, trackTrades)
      var prevClose = Double.NaN
      var lastTsUs = Long.MinValue
      var lastEventId = Long.MinValue
      state.getOption.foreach { s =>
        if (s.hasPrev) prevClose = s.prevClose
        lastTsUs = s.lastTsUs
        lastEventId = s.lastEventId
        book.restoreOpen(
          s.longs.map { case (ts, px) => OpenPos(ts, px, isLong = true) },
          s.shorts.map { case (ts, px) => OpenPos(ts, px, isLong = false) })
      }
      val stepped = it.flatMap { b =>
        // a bar newer than the watermark but at-or-before this symbol's
        // (ts_us, event_id) high-water mark — cross-batch disorder the
        // watermark cannot catch, or an at-least-once source redelivering
        // the last bar — must not step the book: its price diff would
        // accrue against the wrong previous close, fees would be double
        // charged, positions would double open, and lastTsUs would
        // regress the eviction clock. The event_id tiebreak matches the
        // (ts_us, event_id) sort order bars arrive in, so equal-ts bars
        // with FRESH event ids still process. Dropping enforces contract
        // (1) instead of assuming it.
        if (b.ts_us < lastTsUs || (b.ts_us == lastTsUs && b.event_id <= lastEventId)) {
          Iterator.empty
        } else {
          val diff = if (prevClose.isNaN) Double.NaN else b.close - prevClose
          prevClose = b.close
          lastTsUs = b.ts_us
          lastEventId = b.event_id
          val mtm = book.step(b.ts_us, b.close, diff, b.buy == 1, b.sell == 1)
          emit(book, b, mtm)
        }
      }
      // completion tail: runs after the last bar is consumed, before the
      // operator's completion callback persists the group state
      stepped ++ {
        val (ol, os) = book.snapshotOpen()
        val snap = BookState(
          prevClose, !prevClose.isNaN, lastTsUs, lastEventId,
          ol.map(p => (p.entryUs, p.entryPrice)),
          os.map(p => (p.entryUs, p.entryPrice)))
        if (streaming) {
          state.update(snap)
          // evict once event time moves evictAfterMs past this symbol's
          // newest bar; clamp above the current watermark (a lagging
          // group may already be older than watermark - evictAfter)
          // floorDiv, not /: truncation rounds a pre-1970 µs timestamp
          // UP to the next ms, anchoring eviction 1 ms late
          state.setTimeoutTimestamp(
            math.max(Math.floorDiv(lastTsUs, 1000L) + evictAfterMs,
              state.getCurrentWatermarkMs() + 1))
          Iterator.empty
        } else {
          // BATCH execution: GroupState is discarded when the job ends
          // and the eviction timeout never fires, so open positions
          // would silently vanish. Flush them through the same eviction
          // path — the stream's open-flush analog — so a batch run of
          // the stream job accounts for every position.
          onEvict(snap)
        }
      }
    }
  }

  /** Eviction flush for the blotter stream: force-close every open
    * position at the symbol's last seen close price/timestamp with
    * close_reason EVICTED, using the single [[BookTrade.closedPnlNorm]]
    * expression shape all blotter surfaces share.
    */
  private def evictFlush(cfg: PnlConfig, symbol: Long)(s: BookState): Iterator[StreamTrade] = {
    val all = s.longs.iterator.map { case (ts, px) => (ts, px, true) } ++
      s.shorts.iterator.map { case (ts, px) => (ts, px, false) }
    all.map { case (entryUs, entryPx, isLong) =>
      val t = BookTrade(isLong, entryUs, entryPx, s.lastTsUs, s.prevClose,
        reason = "EVICTED", isClosed = true)
      val pnlNorm = BookTrade.closedPnlNorm(t, cfg.feeRate)
      StreamTrade(symbol, if (isLong) "LONG" else "SHORT",
        entryUs, entryPx, s.lastTsUs, s.prevClose, pnlNorm, pnlNorm * entryPx, "EVICTED")
    }
  }

  /** SURVEY #30: the SAME TradeBook core as the batch engine, run
    * incrementally under `flatMapGroupsWithState` — see
    * [[runSymbolBatch]] for the state/ordering/eviction contract.
    * trackTrades is off: the timeline stream never drains the blotter,
    * so closed-trade records would pile up per batch. An idle symbol's
    * state is dropped after `evictAfterMs` of event time (nothing to
    * flush — timeline points are emitted as bars arrive); if it
    * re-appears later it restarts from a flat book.
    */
  def mtmTimelineStream(
      bars: Dataset[StreamBar], cfg: PnlConfig,
      watermarkDelay: String = "2 hours",
      evictAfterMs: Long = DefaultEvictAfterMs): Dataset[StreamPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val streaming = bars.isStreaming
    orderedBySymbolTime(bars, watermarkDelay)
      .flatMapGroupsWithState[BookState, StreamPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (symbol, it, state: GroupState[BookState]) =>
          runSymbolBatch(cfg, trackTrades = false, streaming, evictAfterMs, it, state) {
            (_, b, mtm) => Iterator.single(StreamPoint(symbol, b.ts_us, b.event_id, mtm))
          }(_ => Iterator.empty)
      }
  }

  /** The trade-blotter twin of [[mtmTimelineStream]]: each micro-batch
    * emits the trades CLOSED by its bars (signal/ROI/stop-loss), with
    * the same fee-included pnl_norm as the batch blotter
    * ([[graft.core.BookTrade.closedPnlNorm]]). Open positions checkpoint
    * through GroupState and surface once closed — or force-closed as
    * EVICTED rows when the symbol's state is dropped after
    * `evictAfterMs` of event-time idleness ([[evictFlush]]), the
    * append-mode analogue of the batch blotter's OPEN flush.
    */
  def mtmBlotterStream(
      bars: Dataset[StreamBar], cfg: PnlConfig,
      watermarkDelay: String = "2 hours",
      evictAfterMs: Long = DefaultEvictAfterMs): Dataset[StreamTrade] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val streaming = bars.isStreaming
    orderedBySymbolTime(bars, watermarkDelay)
      .flatMapGroupsWithState[BookState, StreamTrade](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (symbol, it, state: GroupState[BookState]) =>
          runSymbolBatch(cfg, trackTrades = true, streaming, evictAfterMs, it, state) {
            (book, _, _) =>
              book.drainTrades().map { t =>
                val pnlNorm = BookTrade.closedPnlNorm(t, cfg.feeRate)
                StreamTrade(symbol, if (t.isLong) "LONG" else "SHORT",
                  t.entryUs, t.entryPrice, t.exitUs, t.exitPrice,
                  pnlNorm, pnlNorm * t.entryPrice, t.reason)
              }
          }(evictFlush(cfg, symbol))
      }
  }

  /** Streaming as-of join input: the tagged union the batch operator
    * ([[graft.operators.AsofJoin]]) builds internally, made explicit —
    * side 0 = right (the quoted/prevailing stream), side 1 = left (the
    * probing stream). Payload is (event_id, value), the same shape the
    * q_asof_join wiring carries.
    */
  final case class AsofIn(key: Long, ts_us: Long, side: Int, event_id: Long, value: Double)

  /** One emitted row per LEFT input row: the left payload plus the
    * prevailing right row's payload, None when no right row at-or-before
    * the left timestamp has been seen (the batch operator's NULLs).
    */
  final case class AsofMatch(
      key: Long, ts_us: Long, event_id: Long, value: Double,
      r_ts_us: Option[Long], r_event_id: Option[Long], r_value: Option[Double])

  /** ONE-row carry state per key — the streaming as-of join's entire
    * memory: the prevailing right row. `(r_ts_us, r_event_id)` doubles
    * as the right-side high-water mark and `(l_ts_us, l_event_id)` as
    * the left-side one — an at-least-once source redelivering a right
    * row must not regress the carry, and redelivering a LEFT row must
    * not re-emit its match into the append sink.
    */
  final case class AsofCarry(
      hasRight: Boolean, r_ts_us: Long, r_event_id: Long, r_value: Double,
      l_ts_us: Long, l_event_id: Long)

  /** SURVEY #32's streaming twin: the batch operator's prevailing-row
    * carry (`last(__r, ignoreNulls) over (order by ts, side)`) run
    * incrementally under `flatMapGroupsWithState` with ONE row of state
    * per key. Identical tie semantics: within a batch rows arrive
    * (ts_us, side, event_id)-sorted, so at equal ts the right row
    * updates the carry BEFORE the left row reads it (ties include
    * equality, as in `ON l.ts >= r.ts`).
    *
    * Contracts, mirroring [[runSymbolBatch]]: (1) per-key in-order
    * arrival ACROSS batches (the watermark + per-batch sort orders
    * within a batch); rows at-or-under the carry's per-side
    * (ts_us, event_id) high-waters — cross-batch disorder or
    * at-least-once redelivery — are dropped: a stale right row must not
    * regress the carry, and a stale left row's match is either already
    * in the append-only sink (redelivery) or would answer against a
    * future carry (disorder), so neither re-emits.
    * (2) Idle keys are evicted after `evictAfterMs` of EVENT time —
    * state is one row per key, and eviction bounds the KEY set, the
    * axis that actually grows on a run-forever stream; a key
    * re-appearing later restarts with no prevailing row (the same
    * at-most-once-per-horizon tradeoff as [[corpusIngestStream]]'s
    * dedup state).
    */
  def asofJoinStream(
      rows: Dataset[AsofIn],
      watermarkDelay: String = "2 hours",
      evictAfterMs: Long = DefaultEvictAfterMs): Dataset[AsofMatch] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val streaming = rows.isStreaming
    val clustered = rows.toDF()
      .withColumn("et", timestamp_micros(col("ts_us")))
      .withWatermark("et", watermarkDelay)
      .repartition(col("key"))
    graft.plans.LocalSortHint(clustered, "key", "ts_us", "side", "event_id")
      .groupBy(col("key")).as[Long, AsofIn]
      .flatMapGroupsWithState[AsofCarry, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, it, state: GroupState[AsofCarry]) =>
          if (state.hasTimedOut) {
            // nothing to flush: every left row already answered on
            // arrival; dropping the carry only bounds the key set
            state.remove()
            Iterator.empty
          } else {
            var carry = state.getOption.getOrElse(AsofCarry(
              hasRight = false, Long.MinValue, Long.MinValue, 0.0,
              Long.MinValue, Long.MinValue))
            var lastTsUs = math.max(carry.r_ts_us, carry.l_ts_us)
            val matched = it.flatMap { row =>
              if (row.side == 0) {
                // right: advance the carry unless at-or-under the
                // high-water (redelivered or regressing right row)
                if (row.ts_us > carry.r_ts_us ||
                  (row.ts_us == carry.r_ts_us && row.event_id > carry.r_event_id)) {
                  carry = carry.copy(hasRight = true,
                    r_ts_us = row.ts_us, r_event_id = row.event_id, r_value = row.value)
                }
                lastTsUs = math.max(lastTsUs, row.ts_us)
                Iterator.empty
              } else if (row.ts_us < carry.l_ts_us ||
                (row.ts_us == carry.l_ts_us && row.event_id <= carry.l_event_id)) {
                // redelivered left row: its match is already in the
                // (append-only) sink — emitting again would duplicate it
                Iterator.empty
              } else {
                carry = carry.copy(l_ts_us = row.ts_us, l_event_id = row.event_id)
                lastTsUs = math.max(lastTsUs, row.ts_us)
                Iterator.single(AsofMatch(
                  row.key, row.ts_us, row.event_id, row.value,
                  if (carry.hasRight) Some(carry.r_ts_us) else None,
                  if (carry.hasRight) Some(carry.r_event_id) else None,
                  if (carry.hasRight) Some(carry.r_value) else None))
              }
            }
            matched ++ {
              if (streaming) {
                state.update(carry)
                state.setTimeoutTimestamp(
                  math.max(Math.floorDiv(lastTsUs, 1000L) + evictAfterMs,
                    state.getCurrentWatermarkMs() + 1))
              }
              Iterator.empty
            }
          }
      }
  }
}
