package graft.operators

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural gates for the hopping-window aggregation: the on-the-hour
  * hopping windows must equal the tumbling twin exactly (same span,
  * same quantized sum), and every event must land in exactly
  * window/slide = 4 windows.
  */
class HoppingAggSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"

  test("on-the-hour hopping windows equal the tumbling aggregation") {
    val events = Tables.events(spark, sfDir)
    val hourly = Analytics.hoppingAgg(events)
      .filter(unix_micros(col("wstart")) % (3600L * 1000000L) === 0L)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val tumbling = Analytics.tumblingAgg(events)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(tumbling.nonEmpty)
    assert(hourly == tumbling,
      s"hour-aligned hopping windows diverged from tumbling: ${(tumbling.toSet diff hourly.toSet).take(3)}")
  }

  test("every event lands in exactly window/slide = 4 hopping windows") {
    val events = Tables.events(spark, sfDir)
    val memberships = Analytics.hoppingAgg(events)
      .agg(sum("n_events")).head().getLong(0)
    assert(memberships == 4L * events.count())
  }
}
