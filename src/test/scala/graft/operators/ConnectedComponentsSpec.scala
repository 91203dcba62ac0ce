package graft.operators

import scala.util.Random
import graft.{Sessions, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** ConnectedComponents.dupGroups vs a scalar union-find, on planted
  * shapes (chains — the under-deletion case pair emission misses) and
  * seeded random graphs.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  import spark.implicits._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.dupGroups(pairs.toDF("doc_id_a", "doc_id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to one group (the transitive case pairs alone miss)") {
    val got = run(Seq((10L, 20L), (20L, 30L), (30L, 40L), (50L, 60L)))
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L, 50L -> 50L, 60L -> 50L))
  }

  test("an empty pair set yields an empty labeling, not an NPE") {
    assert(run(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("seeded random graphs match a scalar union-find") {
    val rnd = new Random(20260812L)
    for (round <- 1 to 6) {
      val n = 20 + rnd.nextInt(60)
      val pairs = (1 to n).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)
      assert(run(pairs) == unionFind(pairs), s"round $round")
    }
  }

  test("groups over real jaccard pairs: every group's members share its min id") {
    val groups = ConnectedComponents.dupGroups(
      Dedup.ngramJaccardPairs(Tables.documents(spark, "/root/testdata/sf0.001"),
        maxShingleDf = Some(1000)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(groups.nonEmpty)
    val byGroup = groups.groupBy(_._2)
    byGroup.foreach { case (gid, members) =>
      assert(members.map(_._1).min == gid, s"group $gid's min member is not its label")
    }
  }
}
