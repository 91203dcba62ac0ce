package graft.operators

import graft.core.PnlConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The user-facing API mirroring the reference's public surface:
  * `Trade_Mtm_Runner.calculate(symbol, buy_df, sell_df) → Mtm_Result`
  * (reference: runner_mtm.py:71-205) — except Spark-native and
  * multi-symbol: one call computes every symbol's result from one
  * distributed pipeline instead of a per-symbol pandas loop.
  */
object MtmRunner {

  /** The reference's `Mtm_Result` (models.py:203-234), re-expressed as
    * lazy DataFrames: `summary` carries the scalar block (pnl,
    * max_drawdown, sharpe_ratio per symbol), `timeline` the pnl_timeline
    * dict, `trades` the archive + outstanding lists.
    */
  final case class MtmResult(summary: DataFrame, timeline: DataFrame, trades: DataFrame)

  /** Run the full MTM calculation for every symbol in `bars`.
    *
    * @param bars canonical bar view: (symbol, ts_us, event_id, close,
    *             buy, sell) — see [[MtmEngine.barsFromEvents]].
    */
  def calculate(bars: DataFrame, cfg: PnlConfig = PnlConfig.default): MtmResult = {
    // run the state machine ONCE per output family: the timeline and
    // blotter are materialized lazily and every summary metric is an
    // agg/window over them — without this, each of pnl/drawdown/sharpe
    // would re-execute the repartition+sort+mapPartitions pipeline
    // (exchange reuse shares the shuffle write but not the engine work)
    val tl = MtmEngine.timeline(bars, cfg).localCheckpoint(false)
    val bl = MtmEngine.blotter(bars, cfg).localCheckpoint(false)
    val summary = MtmEngine.pnlSummaryFrom(tl, bl)
      .join(MtmEngine.maxDrawdownFrom(tl), Seq("symbol"), "left")
      .join(MtmEngine.sharpeRatioFrom(tl), Seq("symbol"), "left")
    MtmResult(
      summary = summary,
      timeline = MtmEngine.timelineQueryFrom(tl),
      trades = MtmEngine.blotterQueryFrom(bl))
  }

  /** The reference's `HyperOptPnlCalculator_Adapter`
    * (runner_mtm.py:207-236): a near-zero pnl is mapped to the sentinel
    * floor (−1e50) and its drawdown to the ceiling (1e50) so hyper-opt
    * search never selects a do-nothing parameterization.
    */
  def hyperOptAdapter(summary: DataFrame): DataFrame = {
    // flag first: rewriting pnl in place would un-flag the row before
    // the drawdown rewrite sees it
    val flagged = summary
      .withColumn("_degen", abs(col("pnl")) < 1e-12)
      .withColumn("pnl", when(col("_degen"), lit(-1e50)).otherwise(col("pnl")))
    val clamped =
      if (summary.columns.contains("max_drawdown"))
        flagged.withColumn(
          "max_drawdown", when(col("_degen"), lit(1e50)).otherwise(col("max_drawdown")))
      else flagged
    clamped.drop("_degen")
  }
}
