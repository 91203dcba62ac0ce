package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Scratch bimodality probe for q_dedup_minhash_lsh (r10): isolated
  * fresh-JVM bench runs at sf1 bounce 4.3 s .. 31 s on identical
  * binaries/data. Runs the query N times in one session with a stage
  * listener and prints each run's slowest stages (wall vs summed
  * executor run time), so a straggler/wait mode (wall >> cpu) separates
  * from a genuinely recomputed/heavier plan. Run manually:
  * Test/runMain graft.MinhashProfile [sfDir] [nRuns]
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.lift(0).getOrElse("/tmp/graft_sf1")
    val nRuns = args.lift(1).map(_.toInt).getOrElse(6)
    // (stageId, name, wallMs, nTasks, execRunMs, shufReadMB, shufWriteMB, gcMs)
    val stages = mutable.ArrayBuffer[(Int, String, Long, Int, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.failureReason.isDefined) return // a retry re-reports the bytes
        val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        val tm = si.taskMetrics
        stages.synchronized {
          stages += ((si.stageId, si.name.linesIterator.next().take(70), ms,
            si.numTasks, tm.executorRunTime,
            tm.shuffleReadMetrics.totalBytesRead >> 20,
            tm.shuffleWriteMetrics.bytesWritten >> 20,
            tm.jvmGCTime))
        }
      }
    })
    val docs = Tables.documents(spark, sf)
    // fixed single-thread spin calibration: if this slows in the same
    // runs the query slows, the host (vCPU throttle/steal) is the cause,
    // not the plan
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L; var i = 0
      while (i < 200000000) { x = x * 6364136223846793005L + 1442695040888963407L; x ^= x >>> 33; i += 1 }
      if (x == 42) println("never")
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to nRuns) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      Dedup.minhashLshPairs(docs).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the listener bus drain
      val snap = stages.synchronized(stages.toVector)
      val wallSum = snap.map(_._3).sum / 1000.0
      val cal = calibrate()
      val gcSum = snap.map(_._8).sum / 1000.0
      println(f"[mh] run $i total=$total%.2f s stages=${snap.size} wallSum=$wallSum%.1f s gcSum=$gcSum%.1f s cal=$cal%.2f s")
      snap.sortBy(-_._3).take(10).foreach { case (id, name, ms, nt, rt, sr, sw, gc) =>
        println(f"[mh]   stage=$id%-4d wall=${ms / 1000.0}%6.2f s cpu=${rt / 1000.0}%7.2f s gc=${gc / 1000.0}%6.2f s tasks=$nt%-3d read=${sr}MB write=${sw}MB")
      }
    }
    spark.stop()
  }
}
