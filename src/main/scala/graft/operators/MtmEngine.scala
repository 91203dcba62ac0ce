package graft.operators

import graft.core.{BookTrade, OpenPos, PnlConfig, TradeBook}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed mark-to-market engine — the Spark-native re-expression of
  * the reference's `Trade_Mtm_Runner.calculate` → `Mtm_Result` pipeline
  * (reference: runner_mtm.py:71-205, trade_reward.py:81-170).
  *
  * Plan shape (SURVEY.md §4): canonical bars → `repartition($"symbol")` →
  * `sortWithinPartitions(symbol, ts, event_id)` → `mapPartitions` running
  * the [[graft.core.TradeBook]] state machine per symbol-run. ONE shuffle
  * total; parallelism = #symbols spread by hash; per-task state is
  * O(open positions) and rows stream through an iterator, so a skewed
  * mega-symbol is wall-clock-bound but never OOMs. At 100 TB the symbol
  * count vastly exceeds core count, so the hash spread stays even.
  *
  * Numeric discipline: per-bar mtm is pure double arithmetic (replicated
  * bit-for-bit by the DuckDB oracle); every cumulative/aggregated series
  * (pnl_ratio, drawdown, pnl, sharpe's sum) quantizes to exact 1e-9
  * units and sums in an overflow-safe decimal accumulator (see
  * [[ExactNum]]), so results are exact, independent of partitioning/
  * aggregation order, AND engine-agnostic — the properties that keep
  * 100 TB runs reproducible.
  */
object MtmEngine {

  /** Input bar (μs epoch; event_id tiebreaks equal timestamps). */
  private[graft] final case class EngineBar(
      symbol: Long, ts_us: Long, event_id: Long, close: Double, buy: Int, sell: Int)

  private[graft] final case class TimelinePoint(
      symbol: Long, ts_us: Long, event_id: Long, close: Double,
      buy: Int, sell: Int, mtm_ratio: Double)

  private[graft] final case class BlotterRec(
      symbol: Long, direction: String, entry_ts_us: Long, entry_price: Double,
      exit_ts_us: Option[Long], exit_price: Option[Double],
      pnl_norm: Option[Double], close_reason: Option[String], is_closed: Boolean)

  /** events → canonical bar view (SURVEY §2): user_id plays the symbol,
    * value the close price, purchase/click the buy/sell signals; every
    * event row is a bar (non-signal types are hold bars). Contract: a
    * bar requires a POSITIVE close price — every engine output is
    * normalized by an entry price, so a zero/negative close would put
    * IEEE ±inf/NaN into the pnl algebra (and SQL engines disagree with
    * IEEE on x/0). Non-positive-price events are excluded here and in
    * every oracle's bar CTE, symmetrically.
    */
  def barsFromEvents(events: DataFrame): DataFrame =
    events.filter(col("value") > 0).select(
      col("user_id").as("symbol"),
      unix_micros(col("ts")).as("ts_us"),
      col("event_id"),
      col("value").as("close"),
      when(col("event_type") === "purchase", 1).otherwise(0).as("buy"),
      when(col("event_type") === "click", 1).otherwise(0).as("sell"))

  /** The engine's only shuffle: co-locate each symbol's bars and order
    * them totally within the partition (secondary sort). AQE partition
    * coalescing is safe: symbol runs stay contiguous because a symbol
    * hashes to exactly one pre-coalesce partition.
    */
  private def sortedBars(bars: DataFrame, colocated: Boolean = false): Dataset[EngineBar] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val projected = bars
      .select(
        col("symbol").cast("long"), col("ts_us").cast("long"),
        col("event_id").cast("long"), col("close").cast("double"),
        col("buy").cast("int"), col("sell").cast("int"))
    // colocated: the caller guarantees each symbol's bars already share
    // a partition (a symbol-bucketed table scan — BucketedTables.bars),
    // so the engine's one exchange is elided and only the in-partition
    // secondary sort remains. Opt-in and UNCHECKED: verifying the claim
    // would itself shuffle, and split symbol runs would silently reset
    // book state mid-run — callers own the layout contract
    // (ColocatedEngineSpec pins bit-equality on the bucketed layout).
    val dist = if (colocated) projected else projected.repartition(col("symbol"))
    dist
      .sortWithinPartitions("symbol", "ts_us", "event_id")
      .as[EngineBar]
  }

  /** Per-partition driver: a fresh TradeBook per symbol-run, price_diff
    * derived from the previous bar in-stream (no window needed — the
    * partition is already symbol-ordered).
    */
  private final class SymbolRunner(cfg: PnlConfig, trackTrades: Boolean = true)
      extends Serializable {
    var book: TradeBook = null
    var symbol: Long = 0L
    private var prevClose: Double = Double.NaN

    /** Open positions of the PREVIOUS symbol, flushed when `b` starts a
      * new run (empty otherwise). Must be consumed before stepping `b`.
      */
    def beginBar(b: EngineBar): Seq[(Long, BookTrade)] = {
      if (book == null) {
        book = new TradeBook(cfg, trackTrades); symbol = b.symbol; prevClose = Double.NaN
        Nil
      } else if (b.symbol != symbol) {
        val flushed = book.flushOpen().map(t => (symbol, t))
        book = new TradeBook(cfg, trackTrades); symbol = b.symbol; prevClose = Double.NaN
        flushed
      } else Nil
    }

    /** Run one bar; returns its final mtm (accrual − fees). */
    def stepBar(b: EngineBar): Double = {
      val diff = if (prevClose.isNaN) Double.NaN else b.close - prevClose
      prevClose = b.close
      book.step(b.ts_us, b.close, diff, b.buy == 1, b.sell == 1)
    }

    def endOfPartition(): Seq[(Long, BookTrade)] =
      if (book == null) Nil else book.flushOpen().map(t => (symbol, t))
  }

  /** Per-bar mtm timeline: (symbol, ts_us, event_id, close, buy, sell,
    * mtm_ratio) — the reference's `mtm_history` (trade_reward.py:109,166),
    * one row per input bar.
    */
  def timeline(bars: DataFrame, cfg: PnlConfig, colocated: Boolean = false): DataFrame = {
    val spark = bars.sparkSession
    import spark.implicits._
    sortedBars(bars, colocated).mapPartitions { it =>
      // trackTrades=false: timeline consumers never drain the blotter, so
      // recording closed trades would grow per-task memory with the
      // symbol's trade count instead of O(open positions)
      val r = new SymbolRunner(cfg, trackTrades = false)
      it.map { b =>
        r.beginBar(b) // timeline ignores blotter flushes; resets state
        TimelinePoint(b.symbol, b.ts_us, b.event_id, b.close, b.buy, b.sell, r.stepBar(b))
      }
    }.toDF()
  }

  /** Trade blotter: closed trades (reference `archive_*_positions_list`)
    * plus still-open positions flushed as OPEN rows (reference
    * `outstanding_*` in Mtm_Result, runner_mtm.py:191-203).
    * pnl_norm is the reference's fee-included `pnl_normalized`
    * (models.py:60-91): ((±(exit−entry)) − fee·entry − fee·entry)/entry.
    */
  def blotter(bars: DataFrame, cfg: PnlConfig, colocated: Boolean = false): DataFrame = {
    val spark = bars.sparkSession
    import spark.implicits._
    val feeRate = cfg.feeRate
    sortedBars(bars, colocated).mapPartitions { it =>
      val r = new SymbolRunner(cfg)
      def toRec(sym: Long, t: BookTrade): BlotterRec =
        if (t.isClosed) {
          val pnl = BookTrade.closedPnlNorm(t, feeRate)
          BlotterRec(sym, if (t.isLong) "LONG" else "SHORT", t.entryUs, t.entryPrice,
            Some(t.exitUs), Some(t.exitPrice), Some(pnl), Some(t.reason), is_closed = true)
        } else {
          BlotterRec(sym, if (t.isLong) "LONG" else "SHORT", t.entryUs, t.entryPrice,
            None, None, None, None, is_closed = false)
        }
      val perBar = it.flatMap { b =>
        val flushed = r.beginBar(b)
        r.stepBar(b)
        val closed = r.book.drainTrades().map(t => (r.symbol, t))
        (flushed.iterator ++ closed.iterator).map { case (s, t) => toRec(s, t) }
      }
      // Iterator.++ takes its suffix BY NAME: the end-of-partition flush
      // is built only after perBar exhausts the partition
      perBar ++ r.endOfPartition().iterator.map { case (s, t) => toRec(s, t) }
    }.toDF()
  }

  /** Unified single-pass output row, discriminated by `kind`:
    * "tl" timeline point, "bl" blotter record — see [[combinedRun]].
    */
  private[graft] final case class EngineOut(
      kind: String,
      symbol: Long, ts_us: Long = 0L, event_id: Long = 0L, close: Double = 0.0,
      buy: Int = 0, sell: Int = 0, mtm_ratio: Double = 0.0,
      direction: String = "", entry_ts_us: Long = 0L, entry_price: Double = 0.0,
      exit_ts_us: Option[Long] = None, exit_price: Option[Double] = None,
      pnl_norm: Option[Double] = None, close_reason: Option[String] = None,
      is_closed: Boolean = false)

  /** BOTH output families from ONE engine pass: one shuffle, one sort,
    * one state-machine walk, materialized once; the returned frames are
    * kind-filtered projections over the stored blocks. Consumers that
    * need timeline AND blotter (pnlSummary, MtmRunner.calculate) would
    * otherwise pay the repartition+sort+walk twice — exchange reuse
    * shares the shuffle write between the twin plans but re-runs the
    * sort and the per-bar state machine per family.
    */
  private[graft] def combinedRun(
      bars: DataFrame, cfg: PnlConfig, colocated: Boolean = false): (DataFrame, DataFrame) = {
    val spark = bars.sparkSession
    import spark.implicits._
    val feeRate = cfg.feeRate
    val out = sortedBars(bars, colocated).mapPartitions { it =>
      val r = new SymbolRunner(cfg) // trackTrades: drained per bar below
      def toOut(sym: Long, t: BookTrade): EngineOut =
        if (t.isClosed) {
          val pnl = BookTrade.closedPnlNorm(t, feeRate)
          EngineOut("bl", sym, direction = if (t.isLong) "LONG" else "SHORT",
            entry_ts_us = t.entryUs, entry_price = t.entryPrice,
            exit_ts_us = Some(t.exitUs), exit_price = Some(t.exitPrice),
            pnl_norm = Some(pnl), close_reason = Some(t.reason), is_closed = true)
        } else {
          EngineOut("bl", sym, direction = if (t.isLong) "LONG" else "SHORT",
            entry_ts_us = t.entryUs, entry_price = t.entryPrice)
        }
      val perBar = it.flatMap { b =>
        val flushed = r.beginBar(b)
        val mtm = r.stepBar(b)
        val closed = r.book.drainTrades().map(t => (r.symbol, t))
        Iterator.single(
          EngineOut("tl", b.symbol, b.ts_us, b.event_id, b.close, b.buy, b.sell, mtm)) ++
          (flushed.iterator ++ closed.iterator).map { case (s, t) => toOut(s, t) }
      }
      // by-name ++ suffix: built only after perBar drains the partition
      perBar ++ r.endOfPartition().iterator.map { case (s, t) => toOut(s, t) }
      // EAGER (r16 lazy-checkpoint audit): pnlSummary consumes BOTH
      // returned frames in one job — the tl and bl aggregates' map
      // stages are independent and, lazy, race the block store, each
      // loser re-running the whole engine mapPartitions pass (the
      // priciest kernel in the MTM family). Single-frame callers pay
      // the same one materialization job, just at construction.
    }.toDF().localCheckpoint(eager = true)
    val tl = out.filter(col("kind") === "tl")
      .select("symbol", "ts_us", "event_id", "close", "buy", "sell", "mtm_ratio")
    val bl = out.filter(col("kind") === "bl")
      .select("symbol", "direction", "entry_ts_us", "entry_price",
        "exit_ts_us", "exit_price", "pnl_norm", "close_reason", "is_closed")
    (tl, bl)
  }

  // ---- time-sliced execution (mega-symbol skew hardening, SURVEY §4) ----

  /** Unified slice-input row: a market bar, or (isState) the carried-in
    * book state of a symbol from the previous slice. State rows take
    * ts_us = Long.MinValue so the per-partition sort places them before
    * every bar of their symbol run.
    */
  private[graft] final case class SliceIn(
      symbol: Long, ts_us: Long, event_id: Long, close: Double, buy: Int, sell: Int,
      isState: Boolean, prevClose: Double,
      openLongs: Seq[(Long, Double)], openShorts: Seq[(Long, Double)])

  /** Unified slice-output row, discriminated by `kind`:
    * "tl" timeline point, "bl" blotter record, "st" end-of-slice state.
    */
  private[graft] final case class SliceOut(
      kind: String,
      symbol: Long, ts_us: Long = 0L, event_id: Long = 0L, close: Double = 0.0,
      buy: Int = 0, sell: Int = 0, mtm_ratio: Double = 0.0,
      direction: String = null, entry_ts_us: Long = 0L, entry_price: Double = 0.0,
      exit_ts_us: Option[Long] = None, exit_price: Option[Double] = None,
      pnl_norm: Option[Double] = None, close_reason: Option[String] = None,
      is_closed: Boolean = false,
      prevClose: Double = Double.NaN,
      openLongs: Seq[(Long, Double)] = Nil, openShorts: Seq[(Long, Double)] = Nil)

  private def sliceRunner(cfg: PnlConfig, isLast: Boolean)(
      it: Iterator[SliceIn]): Iterator[SliceOut] = {
    var book: TradeBook = null
    var symbol = 0L
    var prevClose = Double.NaN

    def blRow(sym: Long, t: BookTrade): SliceOut =
      if (t.isClosed) {
        SliceOut("bl", sym,
          direction = if (t.isLong) "LONG" else "SHORT",
          entry_ts_us = t.entryUs, entry_price = t.entryPrice,
          exit_ts_us = Some(t.exitUs), exit_price = Some(t.exitPrice),
          pnl_norm = Some(BookTrade.closedPnlNorm(t, cfg.feeRate)),
          close_reason = Some(t.reason), is_closed = true)
      } else
        SliceOut("bl", sym,
          direction = if (t.isLong) "LONG" else "SHORT",
          entry_ts_us = t.entryUs, entry_price = t.entryPrice)

    def endRun(): Seq[SliceOut] =
      if (book == null) Nil
      else if (isLast) book.flushOpen().map(t => blRow(symbol, t))
      else {
        val (ls, ss) = book.snapshotOpen()
        Seq(SliceOut("st", symbol, prevClose = prevClose,
          openLongs = ls.map(p => (p.entryUs, p.entryPrice)),
          openShorts = ss.map(p => (p.entryUs, p.entryPrice))))
      }

    val perRow = it.flatMap { r =>
      val boundary =
        if (book == null || r.symbol != symbol) {
          val fin = endRun()
          book = new TradeBook(cfg); symbol = r.symbol; prevClose = Double.NaN
          fin
        } else Nil
      if (r.isState) {
        book.restoreOpen(
          r.openLongs.map { case (ts, px) => OpenPos(ts, px, isLong = true) },
          r.openShorts.map { case (ts, px) => OpenPos(ts, px, isLong = false) })
        prevClose = r.prevClose
        boundary.iterator
      } else {
        val diff = if (prevClose.isNaN) Double.NaN else r.close - prevClose
        prevClose = r.close
        val mtm = book.step(r.ts_us, r.close, diff, r.buy == 1, r.sell == 1)
        val closed = book.drainTrades().map(t => blRow(symbol, t))
        boundary.iterator ++
          Iterator(SliceOut("tl", r.symbol, r.ts_us, r.event_id, r.close,
            r.buy, r.sell, mtm_ratio = mtm)) ++
          closed.iterator
      }
    }
    // Iterator.++ takes its suffix BY NAME: the final symbol run's
    // flush/state is built only after perRow exhausts the partition
    perRow ++ endRun().iterator
  }

  /** Time-sliced engine run: bars split into `nSlices` ranges at
    * approximate ts quantiles; each slice runs the normal
    * repartition-sort-mapPartitions pipeline seeded with the previous
    * slice's per-symbol book snapshots (open positions + previous
    * close), materialized slice-by-slice. Output (timeline, blotter) is
    * bar-for-bar identical to the unsliced engine — spec'd in
    * MtmEngineSpec with a planted mega-symbol.
    *
    * Why: the unsliced engine streams a whole symbol through ONE task,
    * so a mega-symbol holding half the corpus makes wall-clock equal to
    * half the corpus on one core, and a straggler task pins a 100 TB
    * scan's worth of input through one executor. Slicing bounds every
    * task's input to ~1/nSlices of the symbol and gives the scheduler a
    * rebalance point (plus a natural checkpoint seam for incremental /
    * append-only runs) at the cost of one extra job per slice. The
    * carried state is O(symbols × max_position) — tiny.
    *
    * Durability caveat: slices chain through `localCheckpoint`, whose
    * blocks are executor-local with lineage truncated — a lost executor
    * mid-run fails the job unrecoverably rather than recomputing. For
    * multi-hour runs on preemptible fleets, wire the inter-slice seam
    * to durable storage instead: write each slice's end-state (the
    * O(symbols × max_position) SliceOut "st" rows) to parquet and seed
    * the next slice from that table — same seam, restartable.
    */
  def runSliced(bars: DataFrame, cfg: PnlConfig, nSlices: Int): (DataFrame, DataFrame) = {
    require(nSlices >= 1, "need at least one slice")
    // approximate quantile cuts balance slice volume even when bar
    // density drifts over time; exactness is irrelevant (any cut is
    // correct, only balance varies). This costs one extra pass over the
    // bars — production jobs with natural boundaries (day files, ingest
    // batches) should pass explicit cuts instead.
    val cuts: Seq[Long] =
      if (nSlices == 1) Nil
      else bars.select(col("ts_us").cast("long")).stat.approxQuantile(
        "ts_us", (1 until nSlices).map(_.toDouble / nSlices).toArray, 0.001)
        // equal quantiles (skewed time density) would be an empty slice —
        // collapse them so the explicit-cut contract stays strict
        .map(_.toLong).distinct.sorted.toSeq
    runSliced(bars, cfg, cuts)
  }

  /** [[runSliced]] with explicit ascending cut timestamps (µs) — slice i
    * covers [cuts(i-1), cuts(i)). No pre-scan: the natural form when
    * slices follow day/batch boundaries known up front.
    */
  def runSliced(bars: DataFrame, cfg: PnlConfig, cutsUs: Seq[Long]): (DataFrame, DataFrame) = {
    // out-of-order or duplicate cuts would make slice ranges overlap —
    // rows in the overlap run through TWO slices and silently duplicate
    require(
      cutsUs.isEmpty || cutsUs.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      s"slice cuts must be strictly ascending, got $cutsUs")
    val spark = bars.sparkSession
    import spark.implicits._
    val typed = bars.select(
      col("symbol").cast("long"), col("ts_us").cast("long"),
      col("event_id").cast("long"), col("close").cast("double"),
      col("buy").cast("int"), col("sell").cast("int"))
    val cuts = cutsUs.toArray
    var state: Dataset[SliceIn] = spark.emptyDataset[SliceIn]
    val parts = (0 to cuts.length).map { i =>
      val lo = if (i == 0) None else Some(cuts(i - 1))
      val hi = if (i == cuts.length) None else Some(cuts(i))
      val isLast = i == cuts.length
      val sliceBars = typed
        .filter(lo.map(col("ts_us") >= _).getOrElse(lit(true))
          && hi.map(col("ts_us") < _).getOrElse(lit(true)))
        .as[EngineBar]
        .map(b => SliceIn(b.symbol, b.ts_us, b.event_id, b.close, b.buy, b.sell,
          isState = false, Double.NaN, Nil, Nil))
      // LAZY local checkpoint: marks the slice output for storage without
      // launching a job per slice — the consumer's single action computes
      // the whole slice chain as one job (5× fewer job launches), each
      // slice's partitions are stored as they are first computed, and
      // slice i+1 (and the final union) read the stored partitions
      // instead of recomputing 0..i.
      // SAFE LAZY (r16 audit): unlike the multi-branch shapes flipped
      // eager this round, no two stages can read slice i's blocks
      // concurrently — slice i's only same-job consumers are slice
      // i+1's map stage and the final-union result stage, and the
      // latter transitively depends on the LAST slice's shuffle, which
      // orders it after every chain stage. Caveat recorded: a caller
      // consuming BOTH returned frames in one job would put two
      // unordered branches on the last slice — today's only sliced
      // caller (q_trades_sliced) reads the blotter frame alone.
      val out = sliceBars.union(state)
        .repartition(col("symbol"))
        .sortWithinPartitions("symbol", "ts_us", "event_id")
        .as[SliceIn]
        .mapPartitions(sliceRunner(cfg, isLast))
        .toDF()
        .localCheckpoint(eager = false)
      state = out.filter(col("kind") === "st")
        .select("symbol", "prevClose", "openLongs", "openShorts")
        .as[(Long, Double, Seq[(Long, Double)], Seq[(Long, Double)])]
        .map { case (sym, pc, ls, ss) =>
          SliceIn(sym, Long.MinValue, 0L, 0.0, 0, 0, isState = true, pc, ls, ss)
        }
      out
    }
    val tl = parts.map(_.filter(col("kind") === "tl")
      .select("symbol", "ts_us", "event_id", "close", "buy", "sell", "mtm_ratio"))
      .reduce(_.unionAll(_))
    val bl = parts.map(_.filter(col("kind") === "bl")
      .select("symbol", "direction", "entry_ts_us", "entry_price",
        "exit_ts_us", "exit_price", "pnl_norm", "close_reason", "is_closed"))
      .reduce(_.unionAll(_))
    (tl, bl)
  }

  // ---- query-surface wrappers (timestamps restored to TIMESTAMP μs) ----

  /** Ordered per-symbol bar window over the engine timeline. */
  private def seqWindow =
    Window.partitionBy("symbol").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Cumulative exact 1e-9-unit sum — see [[ExactNum]] for why
    * quantize-then-sum (engine-agnostic IEEE rounding, overflow-safe
    * decimal accumulator) replaces double→DECIMAL casts.
    */
  private def cumUnits(c: org.apache.spark.sql.Column) =
    sum(ExactNum.units(c, 1e9)).over(seqWindow)

  // Each query surface comes in two forms: the public (bars, cfg) entry
  // and a `*From(timeline/blotter)` form over a precomputed engine
  // output — MtmRunner.calculate materializes the engine ONCE and feeds
  // every summary from it instead of re-running the state machine per
  // metric (exchange reuse shares only the shuffle write, not the
  // sort + mapPartitions work).

  /** SURVEY #4/#5: per-bar mtm_ratio + cumulative pnl_ratio
    * (reference pnl_timeline: runner_mtm.py:136-183).
    */
  def timelineQuery(bars: DataFrame, cfg: PnlConfig, colocated: Boolean = false): DataFrame =
    timelineQueryFrom(timeline(bars, cfg, colocated))

  private[graft] def timelineQueryFrom(tl: DataFrame): DataFrame =
    tl.withColumn("pnl_ratio", ExactNum.toDouble(cumUnits(col("mtm_ratio")), 1e9))
      .select(
        col("symbol"), timestamp_micros(col("ts_us")).as("ts"), col("event_id"),
        col("close"), col("buy"), col("sell"), col("mtm_ratio"), col("pnl_ratio"))

  /** SURVEY #2/#3: the trade blotter as a query. */
  def blotterQuery(bars: DataFrame, cfg: PnlConfig, colocated: Boolean = false): DataFrame =
    blotterQueryFrom(blotter(bars, cfg, colocated))

  /** `pnl` is the reference's raw (price-unit) pnl alongside the
    * normalized one — ProxyTrade exposes both (models.py:60-83,117-131).
    * NOTE the derivation direction is deliberately INVERTED vs the
    * reference: models.py computes raw pnl directly
    * ((exit−entry) − 2·fee·entry) and derives normalized from it, while
    * we derive raw = pnl_norm × entry_price from the already-computed
    * normalized value so the engine, sliced, runner and oracle surfaces
    * stay bit-equal to each other ((x/e)·e is not IEEE-bit-equal to x,
    * so our raw pnl can differ from the reference's by ULPs).
    */
  private[graft] def blotterQueryFrom(bl: DataFrame): DataFrame =
    bl.select(
      col("symbol"), col("direction"),
      timestamp_micros(col("entry_ts_us")).as("entry_ts"), col("entry_price"),
      timestamp_micros(col("exit_ts_us")).as("exit_ts"), col("exit_price"),
      col("pnl_norm"), (col("pnl_norm") * col("entry_price")).as("pnl"),
      col("close_reason"), col("is_closed"))

  /** SURVEY #6: per-symbol max drawdown — running peak of cum-pnl floored
    * at 0, minus current, maxed (reference runner_mtm.py:144,168-172).
    * All-decimal arithmetic end to end, one double conversion at the end.
    */
  def maxDrawdown(bars: DataFrame, cfg: PnlConfig): DataFrame =
    maxDrawdownFrom(timeline(bars, cfg))

  private[graft] def maxDrawdownFrom(tl: DataFrame): DataFrame =
    tl
      // all-integer unit arithmetic end to end (exact in Spark's decimal
      // and DuckDB's hugeint alike) — one double division at the very end
      .withColumn("cum", cumUnits(col("mtm_ratio")))
      .withColumn("runmax", max(col("cum")).over(seqWindow))
      .groupBy("symbol")
      .agg(
        ExactNum.toDouble(
          max(greatest(col("runmax"), lit(0).cast("decimal(38,0)")) - col("cum")), 1e9)
          .as("max_drawdown"))

  /** SURVEY #7: per-symbol Sharpe, reference formula
    * (trade_reward.py:423-450): ms-resolution period, slippage 1e-6,
    * population std, √(365·24) annualization, −1e50 when σ=0. The sum
    * quantizes to 1e-9 units (engine-agnostic, see cumUnits; error
    * ≪ the 4-dp output resolution) and the final 4-dp rounding is
    * floor(x·1e4 + 0.5)/1e4 — `round()` would reintroduce the
    * engine-specific tie semantics the unit scheme exists to avoid. σ
    * uses each engine's stddev_pop; its ~1e-13 relative noise is
    * absorbed by the 4-dp output.
    */
  def sharpeRatio(bars: DataFrame, cfg: PnlConfig): DataFrame =
    sharpeRatioFrom(timeline(bars, cfg))

  private[graft] def sharpeRatioFrom(tl: DataFrame): DataFrame = {
    val xs = col("mtm_ratio") - lit(0.000001)
    // span_ms = 0 (every bar of a symbol inside ONE millisecond, with
    // price movement so σ > 0) must yield the IEEE result DuckDB's
    // double division produces — ±inf by the sign of sum_x, NaN at
    // 0/0 — NOT evaluate the raw division: under ANSI mode (the
    // Spark 4 default) x/0.0 ERRORS the job. count() masked this
    // (column pruning skips the projection); materializing the column
    // crashed — found by the degenerate-bar probe, pinned in
    // MtmEngineSpec. σ > 0 here (the σ = 0 guard below fires first),
    // so dividing by it never flips the sign.
    val raw = when(col("span_ms") =!= 0.0,
        col("sum_x") / (col("span_ms") / lit(1000.0) / lit(3600.0)) /
          col("sigma") * lit(math.sqrt(8760.0)))
      .when(col("sum_x") > 0.0, lit(Double.PositiveInfinity))
      .when(col("sum_x") < 0.0, lit(Double.NegativeInfinity))
      .otherwise(lit(Double.NaN))
    // FLOOR division to ms (not bare `div`, which truncates toward zero):
    // the DuckDB oracle's epoch_ms floors, so a pre-1970 bar not on a ms
    // boundary would land 1 ms apart — same hazard Tables.events corrects
    tl.withColumn("ms", expr("ts_us div 1000 - (CASE WHEN ts_us % 1000 < 0 THEN 1 ELSE 0 END)"))
      .groupBy("symbol")
      .agg(
        ExactNum.sumExact(xs, 1e9).as("sum_x"),
        (max(col("ms")) - min(col("ms"))).cast("double").as("span_ms"),
        stddev_pop(xs).as("sigma"))
      .select(
        col("symbol"),
        when(col("sigma").isNull || col("sigma") === 0.0, lit(-1e50))
          // finite guard: a single-ms symbol gives span 0 → raw ±inf/NaN,
          // which Spark's floor(double)→LONG would mangle (Long.MaxValue /
          // 0) while DuckDB's floor keeps them — pass non-finite through
          // unrounded on both sides (abs(NaN) < k is false in both)
          .when(abs(raw) < lit(1e14),
            floor(raw * lit(1e4) + lit(0.5)).cast("double") / lit(1e4))
          .otherwise(raw)
          .as("sharpe_ratio"))
  }

  /** SURVEY #8: per-symbol summary — total pnl (Σ mtm,
    * trade_reward.py:413-421), closed-trade count, win rate, average
    * holding seconds (reference Mtm_Result surface).
    */
  def pnlSummary(bars: DataFrame, cfg: PnlConfig): DataFrame = {
    // one engine pass for both families (was: independent timeline +
    // blotter runs — double shuffle/sort/state-machine work)
    val (tl, bl) = combinedRun(bars, cfg)
    pnlSummaryFrom(tl, bl)
  }

  private[graft] def pnlSummaryFrom(tl: DataFrame, bl: DataFrame): DataFrame = {
    val pnlAgg = tl
      .groupBy("symbol")
      .agg(ExactNum.sumExact(col("mtm_ratio"), 1e9).as("pnl"))
    val tradeAgg = bl
      .filter(col("is_closed"))
      .groupBy("symbol")
      .agg(
        count(lit(1)).as("n_trades"),
        count(when(col("pnl_norm") > 0.0, 1)).as("n_wins"),
        sum(col("exit_ts_us") - col("entry_ts_us")).as("hold_us"))
    pnlAgg.join(tradeAgg, Seq("symbol"), "left").select(
      col("symbol"), col("pnl"),
      coalesce(col("n_trades"), lit(0L)).as("n_trades"),
      (col("n_wins").cast("double") / col("n_trades").cast("double")).as("win_rate"),
      (col("hold_us").cast("double") / col("n_trades").cast("double") / lit(1000000.0))
        .as("avg_holding_secs"))
  }
}
