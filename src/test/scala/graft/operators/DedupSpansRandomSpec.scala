package graft.operators

import scala.util.Random
import graft.Sessions
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized cross-check of Dedup.dedupSpans vs an independent
  * scalar replica over collision-dense corpora: a tiny vocabulary over
  * short documents forces duplicated windows, overlapping span unions,
  * in-document repeats, and sub-k documents far denser than real data —
  * exactly where a canonical-pick or interval-union bug would hide.
  */
class DedupSpansRandomSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  private def scalarReplica(
      docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    // occurrences of every k-window, globally ordered by (doc_id, pos)
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    for ((id, ts) <- toks; i <- 0 to ts.length - k) {
      val w = ts.slice(i, i + k).mkString(" ")
      occ(w) = (id, i) :: occ.getOrElse(w, Nil)
    }
    val removedPos = scala.collection.mutable.Map.empty[Long, Set[Int]]
    for ((_, lst) <- occ if lst.size >= 2; (id, i) <- lst.sorted.tail)
      removedPos(id) = removedPos.getOrElse(id, Set.empty) ++ (i until i + k)
    toks.map { case (id, ts) =>
      val gone = removedPos.getOrElse(id, Set.empty)
      val kept = ts.zipWithIndex.collect { case (t, i) if !gone(i) => t }
      id -> ((kept.mkString(" "), kept.size.toLong, (ts.size - kept.size).toLong))
    }
  }

  test("random collision-dense corpora: dedupSpans equals the scalar replica") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    for (round <- 1 to 6) {
      val vocab = 2 + rnd.nextInt(4) // 2-5 distinct tokens: dense collisions
      val k = 2 + rnd.nextInt(3) // 2-4 token windows
      val docs = (1L to (20 + rnd.nextInt(30)).toLong).map { id =>
        val len = rnd.nextInt(12) // includes len<k and empty-ish docs
        id -> (0 until len).map(_ => s"t${rnd.nextInt(vocab)}").mkString(" ")
      }
      val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      val expected = scalarReplica(docs, k)
      assert(got == expected,
        s"round $round vocab=$vocab k=$k: " +
          s"diff=${(expected.toSet -- got.toSet).take(3)} | ${(got.toSet -- expected.toSet).take(3)}")
    }
  }
}
