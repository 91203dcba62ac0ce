package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup}

/** Scratch profiler (r20): decompose the wired q_dedup_groups /
  * q_dedup_groups_star wall at sf0.1 into (a) pair derivation, (b) CC
  * loop — with per-round walls from the roundHook and driver-side job /
  * stage counts per phase. Run: Test/runMain graft.CcJobProfile [sfDir].
  */
object CcJobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })
    def counts(): (Int, Int) = { Thread.sleep(300); (jobs.get(), stages.get()) }

    ConnectedComponents.roundHook = (algo, i, sec) =>
      println(f"[ccprof]   round $algo%-12s #$i%2d  $sec%7.3f s")

    for (rep <- 1 to 3; star <- Seq(false, true)) {
      val name = if (star) "star" else "prop"
      val (j0, s0) = counts()
      val t0 = System.nanoTime()
      val pairs = Dedup.ngramJaccardPairs(
        Tables.documents(spark, sfDir), maxShingleDf = Some(1000))
        .localCheckpoint(eager = true) // materialize so CC timing is CC-only
      val t1 = System.nanoTime()
      val (j1, s1) = counts()
      val labels = ConnectedComponents.dupGroups(pairs, starContraction = star)
      labels.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val (j2, s2) = counts()
      println(f"[ccprof] rep$rep $name%-4s pairs ${(t1 - t0) / 1e9}%6.3f s (${j1 - j0} jobs/${s1 - s0} stages)  " +
        f"cc ${(t2 - t1) / 1e9}%6.3f s (${j2 - j1} jobs/${s2 - s1} stages)")
    }
    ConnectedComponents.roundHook = null
    spark.stop()
  }
}
