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

  test("randomized adversarial distributions stay in the rank band and the value set") {
    // the corpus gate above only sees the events table's one benign
    // distribution — sketches earn their keep on the ugly ones: point
    // masses, heavy tails, mixed magnitudes, negatives, 1-row groups
    import spark.implicits._
    val rnd = new scala.util.Random(0x9e13L)
    val groups: Seq[(String, Array[Double])] = Seq(
      "constant" -> Array.fill(5000)(42.0),
      "two_point" -> Array.fill(5000)(if (rnd.nextDouble() < 0.99) 1.0 else 1e9),
      "heavy_tail" -> Array.fill(5000)(math.pow(rnd.nextDouble(), -2.0)),
      "mixed_magnitude" -> Array.fill(5000)(
        if (rnd.nextBoolean()) rnd.nextDouble() * 1e-12 else rnd.nextDouble() * 1e15),
      "negatives" -> Array.fill(5000)(rnd.nextGaussian() * 1e6 - 5e5),
      "dup_heavy" -> Array.fill(5000)(rnd.nextInt(3).toDouble),
      "single_row" -> Array(7.5),
      "two_rows" -> Array(-1.0, 1.0))
    val df = groups.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("event_type", "value").repartition(8)
    val got = Analytics.percentilesApprox(df).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == groups.map(_._1).toSet)
    groups.foreach { case (g, vs) =>
      val sorted = vs.sorted
      val n = sorted.length
      val set = sorted.toSet
      got(g).zip(Seq(0.5, 0.95, 0.99)).foreach { case (v, q) =>
        // ±1% rank band (sketch contract at accuracy 10000 is tighter)
        val lo = sorted(math.max(0, math.ceil((q - 0.01) * n).toInt - 1))
        val hi = sorted(math.min(n - 1, math.ceil((q + 0.01) * n).toInt))
        assert(v >= lo && v <= hi, s"$g q=$q got=$v outside rank band [$lo,$hi]")
        // approx_percentile returns an OBSERVED value, never an interpolation
        assert(set.contains(v), s"$g q=$q got=$v not an element of the group")
      }
    }
  }
}
