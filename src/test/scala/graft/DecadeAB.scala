package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Same-JVM decade A/B (r13, third-decade extension): alternates each
  * query between two scaled dirs (sf10 vs sf100) so the ratio is taken
  * between runs executed seconds apart under the SAME host phase — the
  * committed sf10 numbers are best-of-5 from quiet sessions, but this
  * host's documented bimodality (r12/r13 notes: 1.25-5x day-scale
  * swings) makes a cross-session sf100/sf10 wall ratio meaningless.
  * Interleaving cancels the phase term in the ratio; the per-run total
  * shuffle-write bytes (deterministic per plan+data) are captured as
  * the noise-immune secondary signal.
  *
  * Protocol per query: one untimed warm-up per SIDE at its own scale
  * first (AQE compiles different physical plans at different sizes —
  * Bench's discipline), then nPairs alternating (A, B) timed runs with
  * the shared cache hygiene before every run; reports per-side best
  * wall, min-across-pairs shuffle MB (deterministic per plan+data, so
  * divergence across pairs is itself a signal and is printed), and the
  * B/A ratios. The byte counter takes each stage's first SUCCESSFUL
  * attempt, deduped by stageId (counting every attempt would
  * double-count a retried stage; counting only attempt 0 dropped a
  * stage whose retry succeeded),
  * and the async listener bus is drained by polling the counter until
  * it is stable — both before resetting for a run and before reading
  * its total — so a late-arriving stage event can neither leak into
  * the next run nor be lost at the reset.
  *
  * Test/runMain graft.DecadeAB <dirA> <dirB> [nPairs] [q1,q2,...]
  */
object DecadeAB {
  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/tmp/graft_sf10")
    val dirB = args.lift(1).getOrElse("/tmp/graft_sf100")
    val nPairs = args.lift(2).map(_.toInt).getOrElse(3)
    val qs = args.lift(3).map(_.split(",").toSeq)
      .getOrElse(Seq("q_dedup_ngram_jaccard", "q_dedup_spans", "q_dedup_minhash_lsh"))
    val spark = Sessions.local()
    val shufW = new AtomicLong(0L)
    // Count each stage's FIRST SUCCESSFUL attempt, whatever its attempt
    // number, deduped by stageId: `attemptNumber == 0` alone (the r14
    // shape) made a stage whose attempt 0 failed and whose retry
    // succeeded contribute ZERO bytes — under-counting instead of the
    // double-count the filter was built against. Stage ids never recycle
    // within a SparkContext, so the set is also the cross-run dedup.
    val counted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.failureReason.isEmpty && counted.add(si.stageId))
          shufW.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    // Poll the counter until two consecutive reads agree: the bus is
    // drained. Bounded so a hung bus cannot wedge the harness.
    def drained(): Long = {
      var prev = -1L; var cur = shufW.get(); var waited = 0
      while (cur != prev && waited < 10000) {
        prev = cur; Thread.sleep(400); waited += 400; cur = shufW.get()
      }
      cur
    }
    def run(q: String, dir: String): (Double, Long) = {
      Sessions.dropAllCaches(spark)
      drained(); shufW.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, drained() >> 20)
    }
    for (q <- qs) {
      System.err.println(s"[decade] warm $q A"); run(q, dirA)
      System.err.println(s"[decade] warm $q B"); run(q, dirB)
      var bestA = Double.MaxValue; var bestB = Double.MaxValue
      val mbsA = Seq.newBuilder[Long]; val mbsB = Seq.newBuilder[Long]
      for (p <- 1 to nPairs) {
        val (wa, ma) = run(q, dirA); bestA = math.min(bestA, wa); mbsA += ma
        val (wb, mb) = run(q, dirB); bestB = math.min(bestB, wb); mbsB += mb
        println(f"[decade] $q pair=$p A=$wa%.2f s/${ma}MB B=$wb%.2f s/${mb}MB")
      }
      val (allA, allB) = (mbsA.result(), mbsB.result())
      val mbA = allA.min; val mbB = allB.min
      if (allA.distinct.size > 1 || allB.distinct.size > 1)
        println(s"[decade] WARN $q shuffle MB diverged across pairs " +
          s"(A=${allA.mkString(",")} B=${allB.mkString(",")}) — listener race or plan change")
      val shufRatio = if (mbA == 0) "N/A" else f"${mbB.toDouble / mbA}%.2f"
      println(f"[decade] RESULT $q bestA=$bestA%.3f bestB=$bestB%.3f " +
        f"wallRatio=${bestB / bestA}%.2f shufA=${mbA}MB shufB=${mbB}MB " +
        s"shufRatio=$shufRatio")
    }
    spark.stop()
  }
}
