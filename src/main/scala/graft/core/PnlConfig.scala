package graft.core

/** Which open position a SIGNAL close picks when several are
  * outstanding (max_position > 1) — the reference's `Inventory_Mode`
  * (models.py:36-39) applied by `_get_trade_to_close`
  * (trade_reward.py:380-411: sort by the `ProxyTrade.__lt__` comparator,
  * pop the front). Reference deviation, documented in SURVEY §3: the
  * reference's FIFO/LIFO comparators compare `self` to `self`
  * (models.py:179-186) — always False — so its stable `sorted()` is a
  * no-op and both degrade to insertion order; we implement the INTENDED
  * semantics. Ties preserve insertion order, matching the stable sort.
  */
sealed trait InventoryMode extends Serializable
object InventoryMode {
  /** Close the earliest-entered position (reference default behavior —
    * trade_reward.py:56 hardcodes FIFO).
    */
  case object Fifo extends InventoryMode
  /** Close the latest-entered position. */
  case object Lifo extends InventoryMode
  /** Close the worst-priced position: highest entry price for longs,
    * lowest for shorts (models.py:170-178).
    */
  case object WorstPrice extends InventoryMode
}

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
  * @param inventoryMode which open position a SIGNAL close picks when
  *            several are outstanding (see [[InventoryMode]]); irrelevant
  *            at maxPositionPerSymbol=1.
  */
final case class PnlConfig(
    roi: Map[Int, Double] = Map(0 -> Double.PositiveInfinity),
    stoploss: Double = Double.NegativeInfinity,
    fixedStakeUnitAmount: Double = 100.0,
    enableShortPosition: Boolean = false,
    maxPositionPerSymbol: Int = 1,
    feeRate: Double = 0.0,
    laidBackTax: Double = 0.0,
    inventoryMode: InventoryMode = InventoryMode.Fifo
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
