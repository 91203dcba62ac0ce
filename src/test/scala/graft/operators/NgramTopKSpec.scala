package graft.operators

import graft.{Sessions, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the corpus top-k n-gram probe: exact agreement with an
  * exhaustive count + scalar sort, and the plan must take the top-k
  * heap path (TakeOrderedAndProject), never a global sort.
  */
class NgramTopKSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"

  test("top-k n-grams equal the exhaustive count with deterministic ties") {
    val k = 50
    val got = TextOps.ngramTopK(Tables.documents(spark, sfDir), k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = Dedup.shingleIndex(Tables.documents(spark, sfDir))
      .groupBy("shingle").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = all.sortBy { case (s, n) => (-n, s) }.take(k)
    assert(got.toSeq == expected.toSeq)
  }

  test("plan is TakeOrderedAndProject, not a global sort") {
    val plan = TextOps.ngramTopK(Tables.documents(spark, sfDir), 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k heap path:\n$plan")
  }
}
