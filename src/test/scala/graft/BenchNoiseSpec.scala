package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the r18 host-noise sentinel (Bench object doc): the pure
  * verdict's three trip conditions, their boundaries, and that the
  * calibration workload actually measures something. The sentinel
  * exists because BENCH_r17's committed line was 4.6x reproducible
  * reality and nothing on the line said so — a regression flagged by
  * a quiet host and a phantom flagged by a noisy one must be
  * distinguishable from the artifact alone.
  */
class BenchNoiseSpec extends AnyFunSuite {

  test("quiet host trips nothing") {
    assert(Bench.hostNoiseVerdict(
      calMs = Seq(150, 152, 149, 155, 151, 150),
      gcMs = 4000, wallMs = 40000, nSpready = 2, nQueries = 67).isEmpty)
  }

  test("calibration spread over 1.5x trips; at exactly 1.5x it does not") {
    assert(Bench.hostNoiseVerdict(Seq(100, 151), 0, 1000, 0, 67)
      .exists(_.contains("calibration")))
    // boundary: 150/100 = exactly 1.5x stays quiet (strict >)
    assert(Bench.hostNoiseVerdict(Seq(100, 150), 0, 1000, 0, 67).isEmpty)
  }

  test("gc exceeding suite wall trips (the r17 oversubscription signature)") {
    val r = Bench.hostNoiseVerdict(Seq(150, 151), gcMs = 2977000, wallMs = 1376000,
      nSpready = 0, nQueries = 67)
    assert(r.exists(_.contains("gc")))
    // gc == wall stays quiet (strict >)
    assert(Bench.hostNoiseVerdict(Seq(150, 151), 1000, 1000, 0, 67).isEmpty)
  }

  test("many spread>best queries trip; a few are normal jitter") {
    // threshold is max(5, n/10): 67 queries -> 6
    assert(Bench.hostNoiseVerdict(Seq(150, 151), 0, 1000, 6, 67)
      .exists(_.contains("spread")))
    assert(Bench.hostNoiseVerdict(Seq(150, 151), 0, 1000, 5, 67).isEmpty)
    // small filtered sets (BENCH_ONLY) keep the absolute floor of 5
    assert(Bench.hostNoiseVerdict(Seq(150, 151), 0, 1000, 4, 8).isEmpty)
    assert(Bench.hostNoiseVerdict(Seq(150, 151), 0, 1000, 5, 8)
      .exists(_.contains("spread")))
  }

  test("multiple conditions report every reason") {
    val r = Bench.hostNoiseVerdict(Seq(100, 400), 2000, 1000, 10, 67)
    assert(r.size === 3)
  }

  test("calibration workload returns a positive, repeatable wall") {
    val runs = (1 to 3).map(_ => Bench.calibrateOnce())
    assert(runs.forall(_ > 0))
    // sanity only — no tight bound here: the TEST host may itself be
    // busy, and this suite must not become its own noise victim
    assert(runs.max < 60000, s"calibration took ${runs.max} ms — workload mis-sized")
  }
}
