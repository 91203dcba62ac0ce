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

  test("tail re-run policy v2: within-query disagreement still triggers") {
    // the original r19 criterion (spread > best) is unchanged
    assert(Bench.needsTailRun(best = 1.0, spread = 1.5, nTimed = 2, nRuns = 2,
      suiteNoisy = false, maxStealTicks = 0))
    // spread == best stays quiet (strict >)
    assert(!Bench.needsTailRun(1.0, 1.0, 2, 2, suiteNoisy = false, maxStealTicks = 0))
  }

  test("tail re-run policy v2: a noisy suite arms every heavy query") {
    // the whole-window stall leaves runs AGREEING at the wrong value
    // (spread ~0), so only the suite verdict can arm the escape
    assert(Bench.needsTailRun(9.5, 0.2, 2, 2, suiteNoisy = true, maxStealTicks = 0))
    // light queries stay out even on a noisy suite (0.5 s floor)
    assert(!Bench.needsTailRun(0.49, 0.0, 2, 2, suiteNoisy = true, maxStealTicks = 0))
    // a quiet suite with agreeing runs re-runs nothing — steady-state
    // suites pay zero tail cost
    assert(!Bench.needsTailRun(9.5, 0.2, 2, 2, suiteNoisy = false, maxStealTicks = 0))
  }

  test("tail re-run policy v2: a per-query steal burst arms the escape alone") {
    // > 10 USER_HZ ticks (0.1 cpu-s); quiet runs log 0-5
    assert(Bench.needsTailRun(1.2, 0.1, 2, 2, suiteNoisy = false, maxStealTicks = 11))
    assert(!Bench.needsTailRun(1.2, 0.1, 2, 2, suiteNoisy = false, maxStealTicks = 10))
  }

  test("tail re-run policy v2: single-run configs and failures never re-run") {
    // explicit nRuns=1 quick passes stay one run per query
    assert(!Bench.needsTailRun(9.5, 0.0, 1, 1, suiteNoisy = true, maxStealTicks = 99))
    // a failed query (best = -1) is reported as -1, not re-run
    assert(!Bench.needsTailRun(-1.0, 0.0, 2, 2, suiteNoisy = true, maxStealTicks = 99))
  }

  test("tail re-run cap keeps the top candidates by suite best (r20)") {
    val cands = (1 to 19).map(i => (s"q$i", i.toDouble))
    val sel = Bench.tailRunSelect(cands)
    assert(sel.size === 12, "19 candidates cap at 12 (r19 side e fired 19)")
    // the kept set is the 12 most expensive — the displaced re-run
    // recovers the most absolute wall there
    assert(sel === (8 to 19).map(i => s"q$i").toSet)
    // under the cap: everything re-runs (quiet-window behavior intact)
    assert(Bench.tailRunSelect(cands.take(5)).size === 5)
    // deterministic tie-break by name
    assert(Bench.tailRunSelect(
      Seq(("b", 1.0), ("a", 1.0), ("c", 1.0)), cap = 2) === Set("a", "b"))
  }

  test("calibration workload returns a positive, repeatable wall") {
    val runs = (1 to 3).map(_ => Bench.calibrateOnce())
    assert(runs.forall(_ > 0))
    // sanity only — no tight bound here: the TEST host may itself be
    // busy, and this suite must not become its own noise victim
    assert(runs.max < 60000, s"calibration took ${runs.max} ms — workload mis-sized")
  }
}
