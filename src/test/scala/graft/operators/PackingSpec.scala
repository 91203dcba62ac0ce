package graft.operators

import graft.{Sessions, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Gates for sequence packing: the distributed two-phase prefix sum
  * must equal a scalar concat-then-chunk replay exactly, be invariant
  * to the bucket count (the parallelism knob must not change results),
  * and handle empty documents (they span the single pack they sit at
  * the boundary of).
  */
class PackingSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"
  private val budget = 2048

  private def collectPacked(buckets: Int): Map[Long, (Long, Long, Long, Long)] =
    Packing.packSequences(Tables.documents(spark, sfDir), budget, buckets)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("pack coordinates equal the scalar concat-then-chunk replay") {
    val toks = TextOps.tokenCount(Tables.documents(spark, sfDir))
      .select("doc_id", "n_ws_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val expected = toks.map { case (id, n) =>
      val start = cum
      cum += n
      val packId = start / budget
      val spanned = (start + math.max(n, 1) - 1) / budget - packId + 1
      id -> (n, packId, start % budget, spanned)
    }.toMap
    val got = collectPacked(buckets = 32)
    assert(got == expected,
      s"diff: ${(expected.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expected.toSet).take(3)}")
  }

  test("result is invariant to the bucket count (parallelism knob)") {
    val base = collectPacked(buckets = 32)
    assert(collectPacked(buckets = 1) == base)
    assert(collectPacked(buckets = 5) == base)
  }

  test("the stats table is bucket-shuffled exactly once") {
    val plan = Packing.packSequences(Tables.documents(spark, sfDir), budget, 32)
      .queryExecution.executedPlan.toString
    val bucketShuffles = "Exchange hashpartitioning\\(bucket".r.findAllIn(plan).length
    assert(bucketShuffles == 1,
      s"expected one bucket exchange (checkpointed window), got $bucketShuffles:\n$plan")
  }

  test("empty documents span exactly the pack at their boundary") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(budget)("tok").mkString(" ")), // fills pack 0 exactly
      (2L, ""),                                    // empty at the pack-1 boundary
      (3L, "one two three")
    ).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, budget, buckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (0L, 0L, 1L))
    assert(got(2L) == (1L, 0L, 1L), "empty doc: 1 pack spanned, not 0")
    assert(got(3L) == (1L, 0L, 1L))
  }

  test("extreme doc_id spans neither overflow nor skew the bucketing") {
    import spark.implicits._
    // ids clustered in a narrow band at the top of the Long range: the
    // old uniform-width formula `(id - lo) * buckets DIV span` wrapped
    // (ANSI: threw) on the multiply. Percentile-cut bucketing must keep
    // pack coordinates exact here regardless of how well the sketch's
    // internal doubles can split a band this close to 2^63 — bucketing
    // quality is a balance knob, never a correctness input.
    val ids = Seq(Long.MinValue + 3) ++ (0 until 40).map(i => Long.MaxValue - 400L + i)
    val docs = ids.map(id => (id, "a b c")).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, tokenBudget = 7, buckets = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    ids.sorted.zipWithIndex.foreach { case (id, i) =>
      val start = 3L * i
      assert(got(id) == (start / 7, start % 7), s"doc $id (rank $i)")
    }
  }

  test("a document larger than the budget spans multiple packs") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(100)("tok").mkString(" ")),
      (2L, Seq.fill(3 * budget)("tok").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, budget, buckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (0L, 0L, 1L))
    // starts at offset 100 of pack 0, runs through packs 0..3
    assert(got(2L) == (0L, 100L, 4L))
  }
}
