package graft.core

import org.scalatest.funsuite.AnyFunSuite
import TestMkt._

/** Port of the reference's behavioural test scenarios to the TradeBook
  * state machine (reference: tests/test_trade_reward_signals.py,
  * test_trade_reward_roi.py, test_trade_reward_stoploss.py,
  * test_trade_fee.py, test_trade_reward_laid_back_tax.py).
  */
class TradeBookSpec extends AnyFunSuite {

  private val Dim = 1000
  private val Step = 100.0
  private val Tol = 0.1

  private def pnlNorm(entry: Double, exit: Double, long: Boolean): Double =
    (if (long) exit - entry else entry - exit) / entry

  // -- test_trade_reward_signals.py:51 (long, no roi/stoploss, ascending) --
  test("long signal, no roi, no stoploss: stays open, mtm ≈ pnl") {
    val mkt = ascending(Dim, Step)
    val book = new TradeBook(PnlConfig.default)
    val mtm = drive(book, mkt, buys = Set(5), sells = Set.empty)
    assert(book.openCount == 1)
    val open = book.flushOpen()
    assert(open.length == 1 && !open.head.isClosed && open.head.isLong)
    assert(open.head.entryUs == mkt(5).tsUs)
    val expected = pnlNorm(mkt(5).close, mkt.last.close, long = true)
    assert(math.abs(mtm.sum - expected) < Tol)
  }

  // -- test_trade_reward_signals.py:96 (short, descending) --
  test("short signal, no roi, no stoploss: stays open, mtm ≈ pnl") {
    val mkt = descending(Dim, Step)
    val book = new TradeBook(PnlConfig(enableShortPosition = true))
    val mtm = drive(book, mkt, buys = Set.empty, sells = Set(5))
    assert(book.openCount == 1)
    val expected = pnlNorm(mkt(5).close, mkt.last.close, long = false)
    assert(math.abs(mtm.sum - expected) < Tol)
  }

  // -- test_trade_reward_signals.py:142 (long with roi, ascending) --
  test("long with roi ladder: closed by ROI at expected bar count") {
    val mkt = ascending(Dim, Step)
    val start = Dim / 4
    val end = Dim / 5 + start
    val expectMtm = pnlNorm(mkt(start).close, mkt(end).close, long = true)
    // reference sets roi={end: expectMtm} post-validation; key 0→+inf is
    // semantically identical (infinite threshold never strictly exceeded).
    val cfg = PnlConfig(roi = Map(0 -> Double.PositiveInfinity, end -> expectMtm))
    val book = new TradeBook(cfg)
    val mtm = drive(book, mkt, buys = Set(start), sells = Set.empty)
    assert(book.openCount == 0)
    val trades = book.drainTrades()
    assert(trades.length == 1 && trades.head.reason == "ROI")
    assert(math.abs(mtm.sum - expectMtm) < Tol)
    // reference asserts len(|mtm|>0) == end - start + 1
    assert(mtm.count(v => math.abs(v) > 0) == end - start + 1)
  }

  // -- test_trade_reward_signals.py:211 (short with roi, descending) --
  test("short with roi ladder: closed by ROI") {
    val mkt = descending(Dim, Step)
    val start = Dim / 4
    val end = Dim / 5 + start
    val expectMtm = pnlNorm(mkt(start).close, mkt(end).close, long = false)
    val cfg = PnlConfig(
      roi = Map(0 -> Double.PositiveInfinity, end -> expectMtm),
      enableShortPosition = true)
    val book = new TradeBook(cfg)
    val mtm = drive(book, mkt, buys = Set.empty, sells = Set(start))
    assert(book.openCount == 0)
    val trades = book.drainTrades()
    assert(trades.length == 1 && !trades.head.isLong && trades.head.reason == "ROI")
    assert(math.abs(mtm.sum - expectMtm) < Tol)
  }

  // -- test_trade_reward_signals.py:267 (long with stoploss, descending) --
  test("long with stoploss: closed at the expected loss") {
    val mkt = descending(Dim, Step)
    val start = Dim / 4
    val end = start + Dim / 5
    val expectedLoss = pnlNorm(mkt(start).close, mkt(end).close, long = false) // positive
    val book = new TradeBook(PnlConfig(stoploss = -expectedLoss))
    val mtm = drive(book, mkt, buys = Set(start), sells = Set.empty)
    assert(book.openCount == 0)
    val trades = book.drainTrades()
    assert(trades.length == 1 && trades.head.reason == "STOP_LOSS")
    assert(math.abs(mtm.sum - -expectedLoss) < Tol)
  }

  // -- test_trade_reward_signals.py:320 (short with stoploss, ascending) --
  test("short with stoploss: closed at the expected loss") {
    val mkt = ascending(Dim, Step)
    val start = Dim / 4
    val end = start + Dim / 5
    val expectedLoss = pnlNorm(mkt(start).close, mkt(end).close, long = true)
    val book = new TradeBook(
      PnlConfig(stoploss = -expectedLoss, enableShortPosition = true))
    val mtm = drive(book, mkt, buys = Set.empty, sells = Set(start))
    assert(book.openCount == 0)
    val trades = book.drainTrades()
    assert(trades.length == 1 && !trades.head.isLong && trades.head.reason == "STOP_LOSS")
    assert(math.abs(mtm.sum - -expectedLoss) < Tol)
  }

  // -- test_trade_reward_signals.py:377 (two longs, FIFO close, max_pos 10) --
  test("two longs + one sell: FIFO closes the first, second stays open") {
    val mkt = ascending(Dim, Step)
    val (l1, l2, s1) = (Dim / 5, 2 * Dim / 5, 3 * Dim / 5)
    val book = new TradeBook(PnlConfig(maxPositionPerSymbol = 10))
    val mtm = drive(book, mkt, buys = Set(l1, l2), sells = Set(s1))
    assert(book.openCount == 1)
    val closed = book.drainTrades()
    val open = book.flushOpen()
    assert(closed.length == 1 && open.length == 1)
    assert(closed.head.entryUs == mkt(l1).tsUs && closed.head.exitUs == mkt(s1).tsUs)
    assert(open.head.entryUs == mkt(l2).tsUs)
    val pnl1 = pnlNorm(mkt(l1).close, mkt(s1).close, long = true)
    val pnl2 = pnlNorm(mkt(l2).close, mkt.last.close, long = true)
    assert(math.abs(mtm.sum - (pnl1 + pnl2)) < Tol)
  }

  // -- test_trade_reward_signals.py:449 (two shorts, FIFO close) --
  test("two shorts + one buy: FIFO closes the first short") {
    val mkt = descending(Dim, Step)
    val (s1, s2, b1) = (Dim / 5, 2 * Dim / 5, 3 * Dim / 5)
    val book = new TradeBook(
      PnlConfig(enableShortPosition = true, maxPositionPerSymbol = 10))
    val mtm = drive(book, mkt, buys = Set(b1), sells = Set(s1, s2))
    assert(book.openCount == 1)
    val closed = book.drainTrades()
    val open = book.flushOpen()
    assert(closed.length == 1 && open.length == 1)
    assert(!closed.head.isLong && closed.head.entryUs == mkt(s1).tsUs
      && closed.head.exitUs == mkt(b1).tsUs)
    assert(open.head.entryUs == mkt(s2).tsUs && !open.head.isLong)
    val pnl1 = pnlNorm(mkt(s1).close, mkt(b1).close, long = false)
    val pnl2 = pnlNorm(mkt(s2).close, mkt.last.close, long = false)
    assert(math.abs(mtm.sum - (pnl1 + pnl2)) < Tol)
  }

  // -- test_trade_reward_signals.py:529 (flat mkt, shorts disabled) --
  test("sell with shorts disabled on flat market: no trades at all") {
    val mkt = flat(Dim)
    val book = new TradeBook(PnlConfig())
    drive(book, mkt, buys = Set.empty, sells = Set(Dim / 5))
    assert(book.openCount == 0)
    assert(book.drainTrades().isEmpty)
  }

  // -- test_trade_reward_signals.py:558 (fees on open and close) --
  test("fee rate charged on open and close bars") {
    val mkt = ascending(Dim, Step)
    val fee = 0.1
    val (l1, s1, l2) = (Dim / 5, 2 * Dim / 5, 3 * Dim / 5)
    val book = new TradeBook(
      PnlConfig(enableShortPosition = true, feeRate = fee, maxPositionPerSymbol = 10))
    val mtm = drive(book, mkt, buys = Set(l1, l2), sells = Set(s1))
    assert(book.openCount == 1)
    // fee-included pnl (models.py:60-83): open+close fee on the closed
    // trade, open fee only on the outstanding one.
    val pnl1 = pnlNorm(mkt(l1).close, mkt(s1).close, long = true) - fee * 2
    val pnl2 = pnlNorm(mkt(l2).close, mkt.last.close, long = true) - fee
    assert(math.abs(mtm.sum - (pnl1 + pnl2)) < Tol)
  }

  // -- test_trade_reward_laid_back_tax.py:28 (flat, no positions) --
  test("laid-back tax charged on every flat bar") {
    val tax = 0.1
    val mkt = flat(Dim)
    val book = new TradeBook(PnlConfig(laidBackTax = tax))
    val mtm = drive(book, mkt, buys = Set.empty, sells = Set.empty)
    assert(math.abs(mtm.sum - -(Dim * tax)) < 0.01)
  }

  // -- test_trade_reward_laid_back_tax.py:62 (tax paused while holding) --
  test("laid-back tax not charged while a position is open") {
    val tax = 0.1
    val mkt = flat(Dim)
    val start = Dim / 2
    val end = start + Dim / 3
    val book = new TradeBook(PnlConfig(laidBackTax = tax))
    val mtm = drive(book, mkt, buys = Set(start), sells = Set(end))
    val expected = -(Dim - (end - start)) * tax
    assert(math.abs(mtm.sum - expected) < 0.01)
  }

  // -- max-position gating (trade_reward.py:277,335) --
  test("max position gate blocks further opens") {
    val mkt = ascending(Dim, Step)
    val book = new TradeBook(PnlConfig(maxPositionPerSymbol = 2))
    drive(book, mkt, buys = Set(10, 20, 30, 40), sells = Set.empty)
    assert(book.openCount == 2)
    val open = book.flushOpen()
    assert(open.map(_.entryUs).toSet == Set(mkt(10).tsUs, mkt(20).tsUs))
  }

  // -- ROI strictness: pnl equal to the threshold must NOT close --
  test("ROI close requires pnl strictly above the threshold") {
    val mkt = ascending(20, 100.0)
    // threshold exactly equals pnl at bar 10; active immediately (key 0)
    val thr = pnlNorm(mkt(5).close, mkt(10).close, long = true)
    val book = new TradeBook(PnlConfig(roi = Map(0 -> thr)))
    drive(book, mkt.take(11), buys = Set(5), sells = Set.empty)
    assert(book.openCount == 1) // pnl == thr at bar 10 → still open
    val book2 = new TradeBook(PnlConfig(roi = Map(0 -> thr)))
    drive(book2, mkt.take(12), buys = Set(5), sells = Set.empty)
    assert(book2.openCount == 0) // strictly above at bar 11 → closed
  }

  // -- inventory modes (models.py:170-186, trade_reward.py:380-411) --

  /** Bars from an explicit close series (1-hour spacing). */
  private def mktFromCloses(closes: Seq[Double]): IndexedSeq[TestMkt.Bar] =
    closes.zipWithIndex.map { case (c, i) =>
      TestMkt.Bar(i, i * TestMkt.HourUs, c,
        if (i == 0) Double.NaN else c - closes(i - 1))
    }.toIndexedSeq

  test("WORST_PRICE closes the highest-entry long first") {
    // longs open at 1000 / 1500 / 1200; sells at bars 4 and 5 must close
    // the 1500 entry (worst for a long) then the 1200 entry.
    val mkt = mktFromCloses(Seq(1000.0, 1500.0, 1200.0, 1300.0, 1100.0, 1400.0))
    val book = new TradeBook(PnlConfig(
      maxPositionPerSymbol = 3, inventoryMode = InventoryMode.WorstPrice))
    drive(book, mkt, buys = Set(0, 1, 2), sells = Set(4, 5))
    val closed = book.drainTrades()
    assert(closed.map(t => (t.entryPrice, t.exitPrice)) ==
      Seq((1500.0, 1100.0), (1200.0, 1400.0)))
    assert(closed.forall(_.reason == "SIGNAL"))
    val open = book.flushOpen()
    assert(open.map(_.entryPrice) == Seq(1000.0))
  }

  test("WORST_PRICE closes the lowest-entry short first") {
    // shorts open at 1500 / 1000 / 1200; buys must close the 1000 entry
    // (worst for a short) then the 1200 entry.
    val mkt = mktFromCloses(Seq(1500.0, 1000.0, 1200.0, 1300.0, 1100.0, 1400.0))
    val book = new TradeBook(PnlConfig(
      maxPositionPerSymbol = 3, enableShortPosition = true,
      inventoryMode = InventoryMode.WorstPrice))
    drive(book, mkt, buys = Set(4, 5), sells = Set(0, 1, 2))
    val closed = book.drainTrades()
    assert(closed.map(t => (t.entryPrice, t.exitPrice)) ==
      Seq((1000.0, 1100.0), (1200.0, 1400.0)))
    assert(closed.forall(t => !t.isLong))
    assert(book.flushOpen().map(_.entryPrice) == Seq(1500.0))
  }

  test("LIFO closes the latest-entered long first") {
    val mkt = mktFromCloses(Seq(1000.0, 1500.0, 1200.0, 1300.0, 1100.0, 1400.0))
    val book = new TradeBook(PnlConfig(
      maxPositionPerSymbol = 3, inventoryMode = InventoryMode.Lifo))
    drive(book, mkt, buys = Set(0, 1, 2), sells = Set(4, 5))
    val closed = book.drainTrades()
    // bar-2 entry (1200) is newest → closed first, then bar-1 (1500)
    assert(closed.map(t => (t.entryUs, t.entryPrice)) ==
      Seq((mkt(2).tsUs, 1200.0), (mkt(1).tsUs, 1500.0)))
    assert(book.flushOpen().map(_.entryUs) == Seq(mkt(0).tsUs))
  }

  // -- accrual starts the bar AFTER entry (trade_reward.py:99-107) --
  test("mtm accrual excludes the entry bar") {
    val mkt = ascending(10, 100.0)
    val book = new TradeBook(PnlConfig.default)
    val mtm = drive(book, mkt, buys = Set(3), sells = Set.empty)
    assert(mtm(3) == 0.0) // entry bar accrues nothing
    assert(mtm(4) == mkt(4).diff / mkt(3).close)
  }
}
