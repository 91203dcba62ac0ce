package graft.core

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized cross-check: TradeBook (incremental, index-scanning)
  * vs RefSim (list-functional replica) over random price paths, signal
  * sequences, and configs — ROI ladders, stop-loss, shorts, fees, taxes,
  * max-position all drawn at random. Any semantic drift between the two
  * formulations fails here long before it could reach an oracle.
  */
class TradeBookRandomSpec extends AnyFunSuite {

  private def randomConfig(rnd: Random): PnlConfig = {
    val roi =
      if (rnd.nextBoolean()) Map(0 -> Double.PositiveInfinity)
      else Map(0 -> (0.05 + rnd.nextDouble() * 0.3),
        (1 + rnd.nextInt(120)) -> rnd.nextDouble() * 0.1)
    PnlConfig(
      roi = roi,
      stoploss = if (rnd.nextBoolean()) Double.NegativeInfinity else -(0.02 + rnd.nextDouble() * 0.3),
      enableShortPosition = rnd.nextBoolean(),
      maxPositionPerSymbol = 1 + rnd.nextInt(4),
      feeRate = if (rnd.nextBoolean()) 0.0 else rnd.nextDouble() * 0.01,
      laidBackTax = if (rnd.nextBoolean()) 0.0 else rnd.nextDouble() * 0.001,
      inventoryMode = rnd.nextInt(3) match {
        case 0 => InventoryMode.Fifo
        case 1 => InventoryMode.Lifo
        case _ => InventoryMode.WorstPrice
      })
  }

  test("random scenarios: TradeBook equals the scalar replica") {
    val rnd = new Random(20260812L)
    for (trial <- 1 to 60) {
      val cfg = randomConfig(rnd)
      val n = 20 + rnd.nextInt(200)
      var price = 50.0 + rnd.nextDouble() * 100
      val bars = (0 until n).map { i =>
        price = math.max(0.5, price * (1.0 + (rnd.nextDouble() - 0.5) * 0.2))
        val buy = rnd.nextInt(5) == 0
        val sell = !buy && rnd.nextInt(5) == 0
        (i * 60_000_000L, price, buy, sell)
      }
      val withDiff = bars.zipWithIndex.map { case ((ts, p, b, s), i) =>
        val diff = if (i == 0) Double.NaN else p - bars(i - 1)._2
        (ts, p, diff, b, s)
      }

      val book = new TradeBook(cfg)
      val gotMtm = withDiff.map { case (ts, p, d, b, s) => book.step(ts, p, d, b, s) }
      val gotClosed = book.drainTrades().map(t => (t.isLong, t.entryUs, t.exitUs, t.reason))
      val gotOpen = book.flushOpen().map(t => (t.isLong, t.entryUs))

      val exp = RefSim.run(cfg, withDiff)
      val expClosed = exp.closed.map(t => (t.long, t.entryUs, t.exitUs, t.reason))
      val expOpen = exp.open.map(t => (t.long, t.entryUs))

      assert(gotClosed.toSet == expClosed.toSet, s"trial $trial ($cfg): closed trades differ")
      assert(gotOpen.toSet == expOpen.toSet, s"trial $trial ($cfg): open positions differ")
      gotMtm.zip(exp.mtm).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) <= 1e-12 * math.max(1.0, math.abs(e)),
          s"trial $trial ($cfg) bar $i: $g vs $e")
      }
    }
  }
}
