package graft.operators

import graft.{Sessions, Tables}
import graft.functions.{FibFinish, RollingHash}
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the deterministic sampling operators: both must equal an
  * independent scalar replay of the key math (RollingHash.hashBytes +
  * FibFinish.finish over the collected input), the Bernoulli fractions
  * must track the configured rates, and the plans must keep their scale
  * shape (no shuffle for the stateless filter; partial-aggregated
  * bounded heaps for the fixed-k sample).
  */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"

  private def scalarKey(id: Long): Long =
    FibFinish.finish(RollingHash.hashBytes(id.toString.getBytes("UTF-8")))

  private lazy val allEvents: Seq[(Long, String)] =
    Tables.events(spark, sfDir).select("event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("stratified sample equals the scalar replay of the key math") {
    val rates = Map("purchase" -> 1.0, "click" -> 0.25, "view" -> 0.05)
    val got = Sampling.stratifiedSample(Tables.events(spark, sfDir), rates)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val expected = allEvents.collect {
      case (id, tpe) if rates.contains(tpe) &&
        scalarKey(id) < math.floor(rates(tpe) * Sampling.KeySpace).toLong => id
    }.toSet
    assert(got == expected,
      s"missed: ${(expected -- got).take(5)}, extra: ${(got -- expected).take(5)}")
  }

  test("kept fractions track the configured rates (3-sigma Bernoulli band)") {
    val rates = Map("purchase" -> 1.0, "click" -> 0.25, "view" -> 0.05)
    val kept = Sampling.stratifiedSample(Tables.events(spark, sfDir), rates)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = allEvents.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // rate-1.0 strata keep everything; unlisted strata are dropped
    assert(kept("purchase") == totals("purchase"))
    assert(!kept.contains("error") && !kept.contains("signup"))
    for ((stratum, r) <- rates if r < 1.0) {
      val n = totals(stratum).toDouble
      val sigma = math.sqrt(n * r * (1 - r))
      assert(math.abs(kept(stratum) - n * r) <= 3 * sigma,
        s"$stratum kept ${kept(stratum)} of $n at rate $r (expected ${n * r} ± ${3 * sigma})")
    }
  }

  test("stratified sample is a stateless filter: no exchange in the plan") {
    // string match, not collect(): AQE's adaptive root hides children
    // from collect until execution, which would make the assert vacuous
    val plan = Sampling.stratifiedSample(
      Tables.events(spark, sfDir), Map("purchase" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"stratified sampling must not shuffle:\n$plan")
  }

  test("fixed-k sample equals the scalar top-k replay, ranks contiguous") {
    val k = 100
    val got = Sampling.fixedSizePerStratum(Tables.events(spark, sfDir), k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = allEvents
      .map { case (id, tpe) => (tpe, scalarKey(id), id) }
      .groupBy(_._1)
      .flatMap { case (tpe, rows) =>
        rows.sortBy(t => (t._2, t._3)).take(k).zipWithIndex.map {
          case ((_, key, id), i) => (tpe, (i + 1).toLong, id, key)
        }
      }.toSet
    assert(got.toSet == expected,
      s"missed: ${(expected -- got.toSet).take(5)}, extra: ${(got.toSet -- expected).take(5)}")
    assert(got.length == expected.size)
  }

  test("split assignment is leakage-safe and tracks the weights") {
    val got = Sampling.splitAssign(Tables.events(spark, sfDir),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("user_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // every row of a user lands in the same split — the anti-leak contract
    val perUser = got.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(perUser.values.forall(_.size == 1),
      s"split leaked across rows of: ${perUser.filter(_._2.size > 1).keys.take(3)}")
    // the split matches the scalar key ladder
    val cut1 = math.floor(0.8 * Sampling.KeySpace).toLong
    val cut2 = math.floor(0.9 * Sampling.KeySpace).toLong
    for ((u, splits) <- perUser) {
      val k = scalarKey(u)
      val expected = if (k < cut1) "train" else if (k < cut2) "val" else "test"
      assert(splits.head == expected, s"user $u key $k: ${splits.head} != $expected")
    }
    // group-level fractions are Bernoulli around the weights (150 users
    // -> 3-sigma bands are wide; this guards gross ladder bugs only)
    val users = perUser.size.toDouble
    val trainFrac = perUser.values.count(_.head == "train") / users
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction off: $trainFrac")
    assert(perUser.values.exists(_.head == "val") && perUser.values.exists(_.head == "test"))
  }

  test("fixed-k runs on map-side partial bounded heaps") {
    val plan = Sampling.fixedSizePerStratum(Tables.events(spark, sfDir), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by_score"),
      s"fixed-k sample must partial-aggregate its heaps:\n$plan")
    assert(plan.split("topk_by_score").length >= 3, // partial + final
      "expected both partial and final heap aggregation")
  }

  test("mixture resample hits the target proportions; limiting source keeps all") {
    val target = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val docs = Tables.documents(spark, sfDir)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.mixtureResample(docs, target)
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    // unlisted sources dropped
    assert(out.map(_._2).toSet.subsetOf(target.keySet))
    // scalar replay of the rate math: N = min(n/w); thr = floor(min(1, w*N/n)*2^24)
    val caps = target.map { case (s, w) => perSource(s) / w }
    val nCap = caps.min
    val expected = docs.select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, s) =>
        target.get(s).exists { w =>
          // limiting source pins to the full key space (the engine's
          // guard against w*cap/n rounding to 0.99999999999999989 for
          // weights not exactly representable in binary)
          val thr =
            if (perSource(s) / w == nCap) Sampling.KeySpace
            else math.floor(math.min(1.0, w * nCap / perSource(s)) * Sampling.KeySpace).toLong
          scalarKey(id) < thr
        }
      }.toSet
    assert(out.toSet == expected,
      s"missed: ${(expected -- out.toSet).take(5)}, extra: ${(out.toSet -- expected).take(5)}")
    // with uniform counts, src0 (largest weight) is limiting: keeps ALL
    assert(out.count(_._2 == "src0") == perSource("src0"), "limiting source must keep all rows")
    // non-limiting sources keep ~w*N rows (3-sigma Bernoulli band)
    Seq("src1", "src2").foreach { s =>
      val kept = out.count(_._2 == s).toDouble
      val exp = target(s) * nCap
      val sigma = math.sqrt(exp * (1 - exp / perSource(s)))
      assert(math.abs(kept - exp) <= 3 * sigma + 1,
        s"$s kept $kept, expected ~$exp (corpus ${perSource(s)})")
    }
  }

  test("shuffle-shard positions equal the scalar sort replay, invariant in buckets") {
    val docs = Tables.documents(spark, sfDir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    // scalar replay: global rank in (key, doc_id) order
    val expected = ids.map(id => (id, scalarKey(id))).sortBy(p => (p._2, p._1))
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    val got = Sampling.shuffleShard(docs, shards = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.length == ids.length)
    got.foreach { case (id, pos, shard) =>
      assert(pos == expected(id), s"doc $id pos $pos != ${expected(id)}")
      assert(shard == pos % 16)
    }
    // the distributed prefix sum must not depend on the bucket count
    val one = Sampling.shuffleShard(docs, shards = 16, buckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    got.foreach { case (id, pos, _) => assert(one(id) == pos, s"bucket variance at $id") }
  }

  test("mixture resample corpus side crosses no wide exchange") {
    val target = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val plan = Sampling.mixtureResample(Tables.documents(spark, sfDir), target)
      .queryExecution.executedPlan.toString
    // the only allowed exchanges are on the #sources-row stats frames;
    // the corpus-side probe must reach the scan through broadcast joins
    // only — assert no SortMergeJoin / shuffled hash join materialized
    assert(plan.contains("BroadcastHashJoin"), s"rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus side must not shuffle-join:\n$plan")
  }
}
