package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Generalized stage-level probe (the MinhashProfile pattern, for any
  * SparkEntry query): N in-JVM runs with per-stage wall/cpu/GC and
  * shuffle read/write bytes — the one-run separator between real plan
  * blowups (shuffle-byte inflation) and this VM's warm-up/host noise.
  * Test/runMain graft.QueryProfile <queryName> [sfDir] [nRuns]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val q = args.lift(0).getOrElse("q_dedup_groups_star")
    val sf = args.lift(1).getOrElse("/tmp/graft_sf1")
    val nRuns = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local()
    val stages = mutable.ArrayBuffer[(Int, Long, Int, Long, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.failureReason.isDefined) return // a retry re-reports the bytes
        val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        val tm = si.taskMetrics
        stages.synchronized {
          stages += ((si.stageId, ms, si.numTasks, tm.executorRunTime,
            tm.shuffleReadMetrics.totalBytesRead >> 20,
            tm.shuffleWriteMetrics.bytesWritten >> 20,
            tm.jvmGCTime,
            tm.diskBytesSpilled >> 20))
        }
      }
    })
    val fn = SparkEntry.queries(q)
    for (i <- 1 to nRuns) {
      // drop operator-persisted caches so every run measures the full
      // pipeline (same hygiene as Bench.timedRun)
      Sessions.dropAllCaches(spark)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      val snap = stages.synchronized(stages.toVector)
      val gcSum = snap.map(_._7).sum / 1000.0
      val shufSum = snap.map(_._6).sum
      val spillSum = snap.map(_._8).sum
      println(f"[qp] $q run $i total=$total%.2f s stages=${snap.size} " +
        f"shufWriteSum=${shufSum}MB gcSum=$gcSum%.1f s diskSpillSum=${spillSum}MB")
      snap.sortBy(-_._2).take(8).foreach { case (id, ms, nt, rt, sr, sw, gc, sp) =>
        println(f"[qp]   stage=$id%-4d wall=${ms / 1000.0}%6.2f s cpu=${rt / 1000.0}%7.2f s " +
          f"gc=${gc / 1000.0}%5.2f s tasks=$nt%-3d read=${sr}MB write=${sw}MB spill=${sp}MB")
      }
    }
    spark.stop()
  }
}
