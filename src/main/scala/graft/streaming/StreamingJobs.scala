package graft.streaming

import graft.core.{BookTrade, OpenPos, PnlConfig, TradeBook}
import graft.operators.ExactNum
import org.apache.spark.sql.{DataFrame, Dataset}
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

  /** Engine input bar (same canonical view as the batch engine). */
  final case class StreamBar(
      symbol: Long, ts_us: Long, event_id: Long, close: Double, buy: Int, sell: Int)

  /** Streamed timeline point. */
  final case class StreamPoint(symbol: Long, ts_us: Long, event_id: Long, mtm_ratio: Double)

  /** Serializable checkpoint of one symbol's book between micro-batches. */
  final case class BookState(
      prevClose: Double, hasPrev: Boolean,
      longs: Seq[(Long, Double)], shorts: Seq[(Long, Double)])

  /** Streamed closed trade (the blotter's is_closed=true rows; open
    * positions live in GroupState and are never emitted — append-mode
    * streams cannot retract).
    */
  final case class StreamTrade(
      symbol: Long, direction: String, entry_ts_us: Long, entry_price: Double,
      exit_ts_us: Long, exit_price: Double, pnl_norm: Double, close_reason: String,
      pnl: Double)

  /** Shared micro-batch group runner for both MTM streams: restore the
    * symbol's book + previous close from GroupState, step the batch's
    * bars in time order feeding `emit`, snapshot back. State is O(open
    * positions) per symbol, exactly like the batch operator's iterator
    * state. Contract: bars must arrive in non-decreasing event-time
    * order across batches for a symbol (in-order source or upstream
    * watermark+sort); intra-batch order is restored by sorting the
    * group.
    */
  private def runSymbolBatch[T](
      cfg: PnlConfig, trackTrades: Boolean,
      it: Iterator[StreamBar], state: GroupState[BookState])(
      emit: (TradeBook, StreamBar, Double) => IterableOnce[T]): Iterator[T] = {
    val book = new TradeBook(cfg, trackTrades)
    var prevClose = Double.NaN
    if (state.exists) {
      val s = state.get
      if (s.hasPrev) prevClose = s.prevClose
      book.restoreOpen(
        s.longs.map { case (ts, px) => OpenPos(ts, px, isLong = true) },
        s.shorts.map { case (ts, px) => OpenPos(ts, px, isLong = false) })
    }
    val out = it.toSeq.sortBy(b => (b.ts_us, b.event_id)).flatMap { b =>
      val diff = if (prevClose.isNaN) Double.NaN else b.close - prevClose
      prevClose = b.close
      val mtm = book.step(b.ts_us, b.close, diff, b.buy == 1, b.sell == 1)
      emit(book, b, mtm)
    }
    val (ol, os) = book.snapshotOpen()
    state.update(BookState(
      prevClose, !prevClose.isNaN,
      ol.map(p => (p.entryUs, p.entryPrice)),
      os.map(p => (p.entryUs, p.entryPrice))))
    out.iterator
  }

  /** SURVEY #30: the SAME TradeBook core as the batch engine, run
    * incrementally under `flatMapGroupsWithState` — see
    * [[runSymbolBatch]] for the state/ordering contract. trackTrades is
    * off: the timeline stream never drains the blotter, so closed-trade
    * records would pile up per batch.
    */
  def mtmTimelineStream(bars: Dataset[StreamBar], cfg: PnlConfig): Dataset[StreamPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[BookState, StreamPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (symbol, it, state: GroupState[BookState]) =>
          runSymbolBatch(cfg, trackTrades = false, it, state) { (_, b, mtm) =>
            Iterator.single(StreamPoint(symbol, b.ts_us, b.event_id, mtm))
          }
      }
  }

  /** The trade-blotter twin of [[mtmTimelineStream]]: each micro-batch
    * emits the trades CLOSED by its bars (signal/ROI/stop-loss), with
    * the same fee-included pnl_norm as the batch blotter
    * ([[graft.core.BookTrade.closedPnlNorm]]). Open positions checkpoint
    * through GroupState and surface only once closed — the batch
    * blotter's OPEN flush has no append-mode equivalent.
    */
  def mtmBlotterStream(bars: Dataset[StreamBar], cfg: PnlConfig): Dataset[StreamTrade] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[BookState, StreamTrade](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (symbol, it, state: GroupState[BookState]) =>
          runSymbolBatch(cfg, trackTrades = true, it, state) { (book, _, _) =>
            book.drainTrades().map { t =>
              val pnlNorm = BookTrade.closedPnlNorm(t, cfg.feeRate)
              StreamTrade(symbol, if (t.isLong) "LONG" else "SHORT",
                t.entryUs, t.entryPrice, t.exitUs, t.exitPrice,
                pnlNorm, t.reason, pnlNorm * t.entryPrice)
            }
          }
      }
  }
}
