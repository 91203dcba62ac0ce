package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Tests the r17 attribution of the ngram pair-derivation's
  * fourth-decade excess (QueryProfile at sf100: the doc_id-window +
  * set-aggregate stage runs 19.6× the cpu of its sf10 twin for 10×
  * rows and grows a 1 GB disk spill — per-partition bytes grow 10× per
  * decade because the local harness pins shuffle partitions to 32
  * cores): alternate the SAME query in one JVM between two
  * `spark.sql.shuffle.partitions` settings (a runtime conf) and
  * capture wall + total shuffle + total disk spill per run. If the
  * scaled-partition side kills the spill and pulls wall toward the
  * linear decade ratio, the superlinear term is partition SIZING (a
  * local-harness artifact a real cluster does not have — partitions
  * scale with data there, exactly what Sessions' "AQE coalesces on a
  * real cluster" note assumes); if not, the excess is in the operator
  * shape itself and needs a plan change.
  *
  * r17 second use: pricing the wired 10x-cores initialPartitionNum
  * session default (the fix this harness motivated) at SMALL scale —
  * <query> accepts a comma-separated list so a whole representative set
  * alternates inside one JVM.
  *
  * Test/runMain graft.PartitionScaleAB <query[,query...]> <sfDir> [nPairs] [pA] [pB]
  */
object PartitionScaleAB {
  def main(args: Array[String]): Unit = {
    val qs = args.lift(0).getOrElse("q_dedup_ngram_jaccard")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sf = args.lift(1).getOrElse("/tmp/graft_sf100")
    val nPairs = args.lift(2).map(_.toInt).getOrElse(2)
    val pA = args.lift(3).getOrElse("32")
    val pB = args.lift(4).getOrElse("320")
    val spark = Sessions.local()
    val shufW = new AtomicLong(0L)
    val spill = new AtomicLong(0L)
    val counted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.failureReason.isEmpty && counted.add(si.stageId)) {
          shufW.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(si.taskMetrics.diskBytesSpilled)
        }
      }
    })
    def drained(): (Long, Long) = {
      var prev = -1L; var cur = shufW.get(); var waited = 0
      while (cur != prev && waited < 10000) {
        prev = cur; Thread.sleep(400); waited += 400; cur = shufW.get()
      }
      (cur, spill.get())
    }
    def run(q: String, partsSpec: String): (Double, Long, Long) = {
      Sessions.dropAllCaches(spark)
      drained(); shufW.set(0L); spill.set(0L)
      // a side spec is "<parts>" or "<parts>+cacheaqe": the suffix also
      // enables AQE inside cached plans (canChangeCachedPlanOutput-
      // Partitioning) — without it a persist()ed frame materializes at
      // the UN-coalesced initial partition count, which is exactly the
      // small-scale tax the first sf0.1 pricing run measured (1.3-1.6x
      // on the persist-heavy ngram/groups/corpus pipelines, flat on
      // scan queries).
      val parts = partsSpec.stripSuffix("+cacheaqe")
      spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        partsSpec.endsWith("+cacheaqe").toString)
      // with AQE coalescing enabled (Sessions default) the INITIAL
      // partition count, not spark.sql.shuffle.partitions, is what the
      // planner uses for non-explicit shuffles — since r17 Sessions sets
      // it to 10x cores, so flipping only shuffle.partitions would be a
      // silent no-op A/B. Flip both so the run is unambiguous either way.
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", parts)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (mb, sp) = drained()
      (wall, mb >> 20, sp >> 20)
    }
    for (q <- qs) {
      System.err.println(s"[partscale] warm $q pA=$pA"); run(q, pA)
      System.err.println(s"[partscale] warm $q pB=$pB"); run(q, pB)
      var bestA = Double.MaxValue; var bestB = Double.MaxValue
      var spA = Long.MaxValue; var spB = Long.MaxValue
      var mbA = 0L; var mbB = 0L
      for (p <- 1 to nPairs) {
        val (wa, ma, sa) = run(q, pA)
        val (wb, mb, sb) = run(q, pB)
        bestA = math.min(bestA, wa); bestB = math.min(bestB, wb)
        spA = math.min(spA, sa); spB = math.min(spB, sb)
        mbA = ma; mbB = mb
        println(f"[partscale] $q pair=$p A($pA)=$wa%.2f s/${ma}MB/spill=${sa}MB " +
          f"B($pB)=$wb%.2f s/${mb}MB/spill=${sb}MB")
      }
      println(f"[partscale] RESULT $q partsA=$pA partsB=$pB bestA=$bestA%.3f " +
        f"bestB=$bestB%.3f wallRatio=${bestB / bestA}%.3f shufA=${mbA}MB shufB=${mbB}MB " +
        f"spillA=${spA}MB spillB=${spB}MB")
    }
    spark.stop()
  }
}
