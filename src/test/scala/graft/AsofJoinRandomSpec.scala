package graft

import scala.util.Random
import graft.operators.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized cross-check of AsofJoin vs a scalar replay over
  * tie-dense corpora: tiny key/ts domains force left-left, left-right
  * and cross-key collisions far denser than real data would produce,
  * which is exactly where an asof ordering bug would hide.
  */
class AsofJoinRandomSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  test("random tie-dense corpora: AsofJoin equals the scalar replay") {
    import spark.implicits._
    val rnd = new Random(20260812L)
    for (round <- 1 to 8) {
      val nKeys = 1 + rnd.nextInt(5)
      val tsDomain = 1 + rnd.nextInt(12) // dense ties
      val left = (1 to 40 + rnd.nextInt(80)).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(tsDomain).toLong, i.toLong)
      }
      // unique (key, ts) on the right — the operator's contract
      val right = rnd.shuffle(
        (for (k <- 0 until nKeys; t <- 0 until tsDomain) yield (k.toLong, t.toLong))
          .filter(_ => rnd.nextDouble() < 0.4))
        .map { case (k, t) => (k, t, k * 1000 + t) }

      val got = AsofJoin(
        left.toDF("k", "ts", "lid"), right.toDF("k", "ts", "rv"), Seq("k"), "ts")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))
        .toSet

      val byKey = right.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      val expected = left.map { case (k, ts, lid) =>
        val prevailing = byKey.getOrElse(k, Nil).takeWhile(_._2 <= ts).lastOption
        (k, ts, lid, prevailing.map(_._2).getOrElse(-1L), prevailing.map(_._3).getOrElse(-1L))
      }.toSet

      assert(got == expected, s"round $round: nKeys=$nKeys tsDomain=$tsDomain")
    }
  }
}
