package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approx percentile sibling: its sketch answer must sit inside a
  * ±1 % rank band around the exact answer (the sketch's own contract at
  * accuracy 10000 is far tighter; the band keeps the spec stable).
  */
class PercentileSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"

  test("approx percentiles land within a ±1% rank band of exact") {
    val events = Tables.events(spark, sfDir)
    val bands = events.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.49)").as("p50_lo"), expr("percentile(value, 0.51)").as("p50_hi"),
      expr("percentile(value, 0.94)").as("p95_lo"), expr("percentile(value, 0.96)").as("p95_hi"),
      expr("percentile(value, 0.98)").as("p99_lo"), expr("percentile(value, 1.00)").as("p99_hi"))
      .collect().map(r => r.getString(0) ->
        Seq((r.getDouble(1), r.getDouble(2)), (r.getDouble(3), r.getDouble(4)),
          (r.getDouble(5), r.getDouble(6)))).toMap
    val approx = Analytics.percentilesApprox(events).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val et = r.getString(0)
      val got = Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))
      got.zip(bands(et)).zip(Seq("p50", "p95", "p99")).foreach { case ((v, (lo, hi)), tag) =>
        assert(v >= lo && v <= hi, s"$et $tag=$v outside rank band [$lo,$hi]")
      }
    }
  }

  test("auto routing: big groups get the sketch plan, small groups the exact plan") {
    val events = Tables.events(spark, sfDir)
    // sf0.01 events >> 1 row/group: a 1-row threshold must flip to approx
    val sketchPlan = Analytics.percentilesAuto(events, maxExactRowsPerGroup = 1L)
      .queryExecution.executedPlan.toString
    assert(sketchPlan.contains("partial_approx_percentile"),
      s"low threshold must route to the map-side-combining sketch:\n$sketchPlan")
    // and a generous threshold keeps the exact (oracle-matched) plan
    val exactPlan = Analytics.percentilesAuto(events, maxExactRowsPerGroup = 10000000L)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("percentile(") && !exactPlan.contains("approx_percentile"),
      s"small groups must keep the exact path:\n$exactPlan")
  }

  test("approx plan partial-aggregates map-side (sketch combines before the shuffle)") {
    val p = Analytics.percentilesApprox(Tables.events(spark, sfDir))
      .queryExecution.executedPlan.toString
    // two-phase aggregate: partial_ before the exchange, final after
    assert(p.contains("partial_approx_percentile"),
      s"sketch must map-side combine:\n$p")
  }
}
