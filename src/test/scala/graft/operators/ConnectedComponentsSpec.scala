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

  private def run(pairs: Seq[(Long, Long)], star: Boolean = false): Map[Long, Long] =
    ConnectedComponents.dupGroups(pairs.toDF("doc_id_a", "doc_id_b"),
        starContraction = star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("non-convergence releases the edge cache and label checkpoints") {
    // the maxIter require fires mid-loop; without the cleanup path the
    // persisted edge set and the current label checkpoint stayed in the
    // block manager until JVM GC noticed (the largest per-call blocks)
    val chain = (1L until 40L).map(i => (i, i + 1))
    def leakedAfter(star: Boolean): Set[Int] = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      intercept[IllegalArgumentException] {
        ConnectedComponents.dupGroups(
          chain.toDF("doc_id_a", "doc_id_b"), maxIter = 2, starContraction = star)
      }
      // unpersists are async (blocking = false): poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      var leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      while (leaked.nonEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100)
        leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      }
      leaked.toSet
    }
    assert(leakedAfter(star = false).isEmpty, "propagation mode leaked blocks")
    // star mode converges a 40-chain in ~log rounds, so 2 is still too few
    assert(leakedAfter(star = true).isEmpty, "star mode leaked blocks")
  }

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

  test("star contraction matches union-find and propagation on seeded graphs") {
    val rnd = new Random(20260807L)
    for (round <- 1 to 4) {
      val n = 20 + rnd.nextInt(60)
      val pairs = (1 to n).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)
      val expected = unionFind(pairs)
      assert(run(pairs, star = true) == expected, s"round $round (vs union-find)")
      assert(run(pairs, star = true) == run(pairs), s"round $round (vs propagation)")
    }
    assert(run(Seq.empty[(Long, Long)], star = true).isEmpty)
  }

  test("self-loop pairs label the vertex as its own group in BOTH modes") {
    // a (v, v) pair must not vanish: the recursive-closure oracle seeds
    // every edge endpoint, so both algorithms must emit the singleton
    val pairs = Seq((5L, 5L), (10L, 20L))
    val expected = Map(5L -> 5L, 10L -> 10L, 20L -> 10L)
    assert(run(pairs) == expected, "propagation")
    assert(run(pairs, star = true) == expected, "star contraction")
    // self-loops only: every vertex is its own component
    assert(run(Seq((7L, 7L)), star = true) == Map(7L -> 7L))
  }

  test("star contraction collapses an adversarially deep chain in O(log n) rounds") {
    // a 2000-link path has diameter 2000: propagation would need 2000
    // rounds (and raises at its default 50); contraction must finish
    // well inside its default O(log n) budget
    val chain = (0L until 2000L).map(i => (i, i + 1))
    val got = run(chain, star = true)
    assert(got.size == 2001 && got.values.forall(_ == 0L),
      "every chain vertex must label to the global min")
    intercept[IllegalArgumentException] {
      run(chain) // propagation: rounds = diameter > maxIter -> loud raise
    }
  }

  test("edge cache sizing: byte-proportional from the pair count, floored, capped") {
    // r17: the cached exchange is sized explicitly (AQE cannot re-plan
    // inside a persisted plan) from the pair COUNT's byte estimate —
    // every measured scale floors at session parallelism (identical
    // plans to the pre-sizing engine), growth starts past ~64 M pairs
    val floor = 32
    assert(ConnectedComponents.edgeParts(0L, floor) == floor)
    assert(ConnectedComponents.edgeParts(25_000L, floor) == floor, "sf0.1-scale floors")
    assert(ConnectedComponents.edgeParts(25_000_000L, floor) == floor, "sf100-scale floors")
    // 640 M pairs x 64 B symmetric = ~41 GB -> 611 advisory chunks
    assert(ConnectedComponents.edgeParts(640_000_000L, floor) == 611)
    assert(ConnectedComponents.edgeParts(Long.MaxValue / 128, floor) == floor * 64,
      "absurd counts saturate at the cap")
    // and the wired integration: a tiny materialized pair set keeps the
    // session floor, so small-SF plans are bit-identical to pre-r17
    import spark.implicits._
    val tiny = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst").localCheckpoint(true)
    val e1 = ConnectedComponents.buildEdges(tiny)
    try {
      assert(e1.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
        "a tiny pair set must keep the session-parallelism floor")
    } finally e1.unpersist(true)
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
