package graft

import graft.operators.Analytics
import graft.sources.BucketedTables
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed co-located join: same answer as the shuffled twin, with
  * the join's exchanges gone from the physical plan.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // defs, not vals: an executed AQE plan stringifies as Current + Initial
  // plan (every exchange counted twice), so each test audits a fresh one
  private def shuffled =
    Analytics.orderRevenueByPriority(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
  private def colocated =
    Analytics.orderRevenueByPriority(
      BucketedTables.orders(spark, sfDir), BucketedTables.lineitem(spark, sfDir))

  test("bucketed and shuffled twins agree row-for-row") {
    val a = shuffled.collect().map(_.toSeq).toSet
    val b = colocated.collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("bucketed layout removes both join exchanges; only the rollup shuffles") {
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(colocated)).length
    assert(exchanges == 1,
      s"co-located join should only shuffle the 5-row priority rollup, saw $exchanges exchanges")
    assert(plan(colocated).contains("SortMergeJoin"))
    assert(plan(colocated).contains("Bucketed: true"), "scan must report the bucketed layout")
  }

  test("plain parquet twin shuffles both join sides (the layout is the difference)") {
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(shuffled)).length
    assert(exchanges == 3, s"expected both join sides + rollup to shuffle, saw $exchanges")
    assert(plan(shuffled).contains("SortMergeJoin"))
  }
}
