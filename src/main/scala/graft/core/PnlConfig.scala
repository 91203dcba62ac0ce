package graft.core

/** PnL-run configuration, mirroring the reference's `PnlCalcConfig`
  * (reference: config.py:5-74). Defaults mirror `PnlCalcConfig
  * .get_default()` (config.py:44-46), NOT the pydantic field defaults —
  * notably laidBackTax defaults to 0.0 here (get_default) while the
  * reference's raw field default is 0.0001 (config.py:39).
  *
  * @param roi take-profit ladder: holding-minutes → normalized-profit
  *            threshold; a position closes once its normalized pnl is
  *            STRICTLY above the smallest threshold whose key (minutes)
  *            has elapsed. Must contain key 0.
  * @param stoploss negative normalized-pnl floor; close when pnl < -|stoploss|.
  * @param fixedStakeUnitAmount notional per trade (bookkeeping only —
  *            all outputs are entry-price-normalized, as in the reference).
  * @param enableShortPosition allow SELL to open shorts.
  * @param maxPositionPerSymbol open-position cap per symbol per side.
  * @param feeRate normalized fee charged on a bar's MTM at open and close.
  * @param laidBackTax normalized tax charged on bars with no open position.
  */
final case class PnlConfig(
    roi: Map[Int, Double] = Map(0 -> Double.PositiveInfinity),
    stoploss: Double = Double.NegativeInfinity,
    fixedStakeUnitAmount: Double = 100.0,
    enableShortPosition: Boolean = false,
    maxPositionPerSymbol: Int = 1,
    feeRate: Double = 0.0,
    laidBackTax: Double = 0.0
) extends Serializable {
  require(roi.contains(0), "missing default roi (key 0)")
  require(roi.keys.forall(_ >= 0), "roi keys must be >= 0")
  require(roi.values.forall(_ >= 0), "roi values must be >= 0")
  require(stoploss < 0, "stoploss must be < 0")
  require(fixedStakeUnitAmount > 0, "fixed unit amount should be > 0")
  require(maxPositionPerSymbol > 0, "max position must be > 0")
}

object PnlConfig {
  /** The reference's `PnlCalcConfig.get_default()` (config.py:44-46):
    * never take profit, never stop out, no fees, no laid-back tax.
    */
  def default: PnlConfig = PnlConfig()
}
