package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Scratch materialization-strategy A/B for the r13 prefix pair phase —
  * Test/runMain graft.NgramProfile3 [sfDir] [runsPerVariant]. Times the
  * full phase-1 pipeline under different `mat` hooks in one JVM with a
  * shuffle-byte listener, so the ranked/perDoc materialization choice
  * rides measured bytes, not theory. Caches are released between runs
  * so no variant free-rides on another's (or its own prior run's)
  * persisted blocks.
  */
object NgramProfile3 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val stages = mutable.ArrayBuffer[(Long, Long)]() // (shufWriteMB, gcMs)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (sc.stageInfo.failureReason.isDefined) return // a retry re-reports the bytes
        val tm = sc.stageInfo.taskMetrics
        stages.synchronized {
          stages += ((tm.shuffleWriteMetrics.bytesWritten >> 20, tm.jvmGCTime))
        }
      }
    })
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(1L).as("g"),
        org.apache.spark.sql.functions.col("text"))
    def run(name: String, mk: () => (DataFrame, Seq[DataFrame])): Unit = {
      for (i <- 1 to runs) {
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        val (pairs, cleanup) = mk()
        pairs.write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        cleanup.foreach(_.unpersist(true))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        Thread.sleep(500)
        val snap = stages.synchronized(stages.toVector)
        println(f"[np3] $name run $i total=$total%.2f s " +
          f"shufWrite=${snap.map(_._1).sum}MB gc=${snap.map(_._2).sum / 1000.0}%.1f s")
      }
    }
    run("A_ckpt_ckpt", () =>
      (Dedup.prefixPairPhase(docs, 0.8, Some(1000), mat = _.localCheckpoint(false))._1, Nil))
    run("D_nomat_ckpt", () => {
      var i = 0
      val p = Dedup.prefixPairPhase(docs, 0.8, Some(1000), mat =
        df => { i += 1; if (i == 1) df else df.localCheckpoint(false) })._1
      (p, Nil)
    })
    run("B_persist_persist", () => {
      val mats = mutable.Buffer[DataFrame]()
      val p = Dedup.prefixPairPhase(docs, 0.8, Some(1000), mat =
        df => { val m = df.persist(); mats += m; m })._1
      (p, mats.toSeq)
    })
    spark.stop()
  }
}
