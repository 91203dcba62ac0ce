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

  test("repetition ratio: planted repeats score high, unique text zero, short text 0.0") {
    import spark.implicits._
    val docs = Seq(
      // 10 words, all "spam spam spam" 3-grams: 8 total, 1 distinct
      (1L, Seq.fill(10)("spam").mkString(" ")),
      (2L, "every word here is completely unique text"), // all distinct
      (3L, "too short"),                                 // no 3-grams
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionRatio(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((8L, 1L, 1.0 - 1.0 / 8.0)))
    assert(got(2L)._3 == 0.0 && got(2L)._1 == got(2L)._2)
    assert(got(3L) == ((0L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("repetition ratio equals the scalar multiset replay on the real corpus") {
    val docs = Tables.documents(spark, sfDir)
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val words = r.getString(1).toLowerCase.replaceAll("\\s+", " ").trim.split(" ").toSeq
      val grams = if (words.size < 3) Seq.empty else words.sliding(3).map(_.mkString(" ")).toSeq
      val ratio = if (grams.isEmpty) 0.0
        else 1.0 - grams.distinct.size.toDouble / grams.size.toDouble
      r.getLong(0) -> ((grams.size.toLong, grams.distinct.size.toLong, ratio))
    }.toMap
    val got = TextOps.repetitionRatio(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
  }
}
