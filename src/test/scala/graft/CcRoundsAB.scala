package graft

import graft.operators.ConnectedComponents
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Attributes the CC fourth-decade wall excess (r16 verdict item 5:
  * q_dedup_groups ran 11.3× wall at 9.9× shuffle for 10× rows — is the
  * extra wall ROUND-COUNT growth (component diameter rising with
  * corpus), per-round fixed cost, or host phase?) by interleaving the
  * two scales in one JVM (the DecadeAB protocol — phase cancels in the
  * ratio) while [[ConnectedComponents.roundHook]] records every
  * propagation/contraction round's wall. Reported per side:
  * rounds, per-round walls, Σrounds (the CC share), and total query
  * wall — (total − Σrounds) is the pair-derivation share, which scales
  * with data but not with diameter.
  *
  * Test/runMain graft.CcRoundsAB <dirA> <dirB> [nPairs] [q1,q2,...]
  */
object CcRoundsAB {
  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/tmp/graft_sf10")
    val dirB = args.lift(1).getOrElse("/tmp/graft_sf100")
    val nPairs = args.lift(2).map(_.toInt).getOrElse(2)
    val qs = args.lift(3).map(_.split(",").toSeq)
      .getOrElse(Seq("q_dedup_groups", "q_dedup_groups_star"))
    val spark = Sessions.local()
    val shufW = new AtomicLong(0L)
    val counted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.failureReason.isEmpty && counted.add(si.stageId))
          shufW.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    def drained(): Long = {
      var prev = -1L; var cur = shufW.get(); var waited = 0
      while (cur != prev && waited < 10000) {
        prev = cur; Thread.sleep(400); waited += 400; cur = shufW.get()
      }
      cur
    }
    // (algo, iter, wall) triples for the CURRENT run — single-threaded
    // harness, so a plain buffer behind the volatile hook is safe
    val rounds = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double)]
    ConnectedComponents.roundHook = (algo, iter, s) => rounds.synchronized {
      rounds += ((algo, iter, s))
    }
    case class RunStat(wall: Double, mb: Long, nRounds: Int, ccSum: Double,
        perRound: Seq[Double])
    def run(q: String, dir: String): RunStat = {
      Sessions.dropAllCaches(spark)
      drained(); shufW.set(0L)
      rounds.synchronized(rounds.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val mb = drained() >> 20
      val rs = rounds.synchronized(rounds.toSeq)
      RunStat(wall, mb, rs.size, rs.map(_._3).sum, rs.map(_._3))
    }
    for (q <- qs) {
      System.err.println(s"[ccrounds] warm $q A"); run(q, dirA)
      System.err.println(s"[ccrounds] warm $q B"); run(q, dirB)
      var bestA: RunStat = null; var bestB: RunStat = null
      for (p <- 1 to nPairs) {
        val a = run(q, dirA); if (bestA == null || a.wall < bestA.wall) bestA = a
        val b = run(q, dirB); if (bestB == null || b.wall < bestB.wall) bestB = b
        println(f"[ccrounds] $q pair=$p A=${a.wall}%.2f s/${a.mb}MB rounds=${a.nRounds} " +
          f"cc=${a.ccSum}%.2f s B=${b.wall}%.2f s/${b.mb}MB rounds=${b.nRounds} " +
          f"cc=${b.ccSum}%.2f s")
        println(s"[ccrounds] $q pair=$p perRoundA=" +
          a.perRound.map(s => f"$s%.2f").mkString(",") +
          " perRoundB=" + b.perRound.map(s => f"$s%.2f").mkString(","))
      }
      // rounds are a plan/data property — divergence across pairs of one
      // side would mean nondeterministic convergence and is loud
      val rr = if (bestA.nRounds == 0) "N/A" else f"${bestB.nRounds.toDouble / bestA.nRounds}%.2f"
      val ccr = if (bestA.ccSum == 0) "N/A" else f"${bestB.ccSum / bestA.ccSum}%.2f"
      println(f"[ccrounds] RESULT $q bestA=${bestA.wall}%.3f bestB=${bestB.wall}%.3f " +
        f"wallRatio=${bestB.wall / bestA.wall}%.2f roundsA=${bestA.nRounds} " +
        f"roundsB=${bestB.nRounds} roundsRatio=$rr ccA=${bestA.ccSum}%.3f " +
        f"ccB=${bestB.ccSum}%.3f ccRatio=$ccr shufA=${bestA.mb}MB shufB=${bestB.mb}MB " +
        f"restA=${bestA.wall - bestA.ccSum}%.3f restB=${bestB.wall - bestB.ccSum}%.3f")
    }
    ConnectedComponents.roundHook = null
    spark.stop()
  }
}
