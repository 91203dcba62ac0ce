package graft.core

import scala.collection.mutable.ListBuffer

/** Independent scalar replica of the reference bookkeeping semantics
  * (reference: trade_reward.py:81-170, helper.py:37-68, models.py:60-156),
  * written list-functional rather than index-imperative so it cross-checks
  * TradeBook's incremental implementation from a different formulation.
  * Used only by tests.
  */
object RefSim {
  final case class SimTrade(
      long: Boolean, entryUs: Long, entryPrice: Double,
      var exitUs: Long = -1L, var exitPrice: Double = Double.NaN,
      var reason: String = null) {
    def closed: Boolean = reason != null
    def pnlNorm(price: Double): Double =
      ((if (long) price - entryPrice else entryPrice - price)) / entryPrice
  }

  final case class Result(mtm: IndexedSeq[Double], closed: Seq[SimTrade], open: Seq[SimTrade])

  /** Run the full bar sequence for one symbol. Bars must be time-ordered;
    * diff(0) is NaN.
    */
  def run(cfg: PnlConfig, bars: Seq[(Long, Double, Double, Boolean, Boolean)]): Result = {
    val roiSec: Map[Long, Double] = cfg.roi.map { case (m, v) => (m * 60L, v) }
    val live = ListBuffer.empty[SimTrade]
    val archive = ListBuffer.empty[SimTrade]
    val mtmHist = IndexedSeq.newBuilder[Double]

    def activeRois(elapsedSec: Long): Iterable[Double] =
      roiSec.collect { case (k, v) if k <= elapsedSec => v }

    def closeTrade(t: SimTrade, tsUs: Long, price: Double, reason: String): Double = {
      t.exitUs = tsUs; t.exitPrice = price; t.reason = reason
      live -= t; archive += t
      math.abs(cfg.feeRate)
    }

    // Signal-close selection per inventory mode (models.py:170-186 via
    // the intended semantics; ties keep the earliest-inserted — maxBy /
    // minBy return the first extremal element, matching a stable
    // sort-then-pop-front).
    def pickClose(side: Boolean): Option[SimTrade] = {
      val cands = live.filter(_.long == side)
      if (cands.isEmpty) None
      else Some(cfg.inventoryMode match {
        case InventoryMode.Fifo => cands.head
        case InventoryMode.Lifo => cands.maxBy(_.entryUs)
        case InventoryMode.WorstPrice =>
          if (side) cands.maxBy(_.entryPrice) else cands.minBy(_.entryPrice)
      })
    }

    for ((tsUs, price, diff, buy, sell) <- bars) {
      var fee = 0.0
      // 1. accrual over trades entered strictly before t
      val mtm =
        if (diff.isNaN) 0.0
        else live.filter(_.entryUs < tsUs)
          .map(t => (if (t.long) diff else -diff) / t.entryPrice).sum
      // 2. ROI closes (longs then shorts), snapshot scan
      for (side <- Seq(true, false); t <- live.filter(_.long == side).toList) {
        val active = activeRois((tsUs - t.entryUs) / 1000000L)
        if (active.nonEmpty && t.pnlNorm(price) > active.min)
          fee += closeTrade(t, tsUs, price, "ROI")
      }
      // 3. stop-loss closes
      for (side <- Seq(true, false); t <- live.filter(_.long == side).toList)
        if (t.pnlNorm(price) < -math.abs(cfg.stoploss))
          fee += closeTrade(t, tsUs, price, "STOP_LOSS")
      // 4. signal
      if (buy) {
        if (live.count(_.long) < cfg.maxPositionPerSymbol) {
          pickClose(side = false) match {
            case Some(short) => fee += closeTrade(short, tsUs, price, "SIGNAL")
            case None =>
              live += SimTrade(long = true, tsUs, price); fee += math.abs(cfg.feeRate)
          }
        }
      } else if (sell) {
        if (live.count(!_.long) < cfg.maxPositionPerSymbol) {
          pickClose(side = true) match {
            case Some(lng) => fee += closeTrade(lng, tsUs, price, "SIGNAL")
            case None if cfg.enableShortPosition =>
              live += SimTrade(long = false, tsUs, price); fee += math.abs(cfg.feeRate)
            case None => ()
          }
        }
      }
      // 5. laid-back tax when flat
      if (live.isEmpty) fee += math.abs(cfg.laidBackTax)
      // 6.
      mtmHist += mtm - fee
    }
    Result(mtmHist.result(), archive.toList, live.toList)
  }
}
