package graft.core

/** Synthetic market series mirroring the reference test fixtures
  * (reference: tests/conftest.py — hourly bars, close = f(i)·step + 1000,
  * price_movement = close.diff()).
  */
object TestMkt {
  final case class Bar(i: Int, tsUs: Long, close: Double, diff: Double)

  val HourUs: Long = 3600L * 1000000L

  private def series(dim: Int, closeAt: Int => Double): IndexedSeq[Bar] =
    (0 until dim).map { i =>
      val d = if (i == 0) Double.NaN else closeAt(i) - closeAt(i - 1)
      Bar(i, i * HourUs, closeAt(i), d)
    }

  def ascending(dim: Int, step: Double = 100.0): IndexedSeq[Bar] =
    series(dim, i => i * step + 1000.0)

  def descending(dim: Int, step: Double = 100.0): IndexedSeq[Bar] =
    series(dim, i => (dim - 1 - i) * step + 1000.0)

  def flat(dim: Int): IndexedSeq[Bar] = series(dim, _ => 1000.0)

  /** Drive a TradeBook over the series; buys/sells give signal indices.
    * Returns the per-bar mtm history (reference mtm_history_value).
    */
  def drive(book: TradeBook, bars: Seq[Bar], buys: Set[Int], sells: Set[Int]): IndexedSeq[Double] =
    bars.map(b => book.step(b.tsUs, b.close, b.diff, buys(b.i), sells(b.i))).toIndexedSeq
}
