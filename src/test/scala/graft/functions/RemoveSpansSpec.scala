package graft.functions

import graft.Sessions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit gate for the [[RemoveSpans]] interval-walk kernel (r13): the
  * span union, the single-space round trip (empties kept — the
  * split/join contract dedupSpans' clean_text depends on), and the
  * degenerate shapes (full coverage, duplicate/adjacent/overlapping
  * starts, k = 1) — independently of the operator, whose end-to-end
  * semantics DedupSpansRandomSpec gates against a scalar replica.
  */
class RemoveSpansSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("2")

  /** Run the kernel over one (text, starts) pair and return
    * (clean_text, n_kept, n_removed).
    */
  private def run(text: String, starts: Seq[Int], k: Int): (String, Long, Long) = {
    import spark.implicits._
    val r = Seq((text, starts))
      .toDF("text", "starts")
      .select(RemoveSpans.column(
        split(col("text"), " "), col("starts").cast("array<int>"), k).as("rs"))
      .select("rs.clean_text", "rs.n_kept", "rs.n_removed")
      .collect()
      .head
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  /** Scalar replica: remove every position covered by any [s, s+k-1]. */
  private def replica(text: String, starts: Seq[Int], k: Int): (String, Long, Long) = {
    val toks = text.split(" ", -1)
    val gone = starts.flatMap(s => s until s + k).toSet
    val kept = toks.zipWithIndex.collect { case (t, i) if !gone(i) => t }
    (kept.mkString(" "), kept.length.toLong, (toks.length - kept.length).toLong)
  }

  test("empty starts: exact round trip, including empty tokens from double spaces") {
    for (text <- Seq("a b c", "a  b", " leading", "trailing ", "", "one"))
      assert(run(text, Nil, 3) === ((text, text.split(" ", -1).length.toLong, 0L)))
  }

  test("single span removes exactly k tokens") {
    assert(run("a b c d e", Seq(1), 2) === (("a d e", 3L, 2L)))
  }

  test("overlapping and adjacent spans union, not double-count") {
    val text = "t0 t1 t2 t3 t4 t5 t6 t7"
    for (starts <- Seq(Seq(0, 1), Seq(0, 2), Seq(0, 0, 1), Seq(2, 4), Seq(0, 4)))
      assert(run(text, starts, 3) === replica(text, starts, 3), s"starts=$starts")
  }

  test("full coverage yields an empty document") {
    assert(run("a b c d", Seq(0, 2), 2) === (("", 0L, 4L)))
  }

  test("k = 1 removes single positions") {
    assert(run("a b c", Seq(0, 2), 1) === (("b", 1L, 2L)))
  }

  test("randomized parity with the scalar replica") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 40) {
      val k = 1 + rnd.nextInt(4)
      val n = k + rnd.nextInt(20)
      val text = (0 until n).map(_ => s"w${rnd.nextInt(5)}").mkString(" ")
      val starts = (0 until rnd.nextInt(6)).map(_ => rnd.nextInt(n - k + 1)).sorted
      assert(run(text, starts, k) === replica(text, starts, k),
        s"round=$round k=$k starts=$starts text=$text")
    }
  }
}
