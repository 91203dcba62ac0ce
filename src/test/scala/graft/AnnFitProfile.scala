package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** r20 (verdict item 4): decompose the flat-across-rounds ANN/embedding
  * queries into CONSTRUCTION (the IVF fit's driver-side draw + Lloyd,
  * the LSH plane build, any eager checkpoints — everything that runs
  * inside `queries(q)(spark, dir)`) vs ACTION (the distributed
  * probe/verify the noop sink times), with driver job counts per
  * phase. The bench's timed run pays both, so whichever phase
  * dominates is the optimization target.
  * Test/runMain graft.AnnFitProfile [sfDir] [reps]
  */
object AnnFitProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Sessions.local()
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def j(): Int = { Thread.sleep(250); jobs.get() }
    val qs = Seq("q_ann_ivf_topk", "q_ann_lsh_topk", "q_ann_bruteforce_topk",
      "q_dedup_embedding_lsh", "q_dedup_embedding_ivf", "q_dedup_embedding")
    for (q <- qs; rep <- 1 to reps) {
      Sessions.dropAllCaches(spark)
      val fn = SparkEntry.queries(q)
      val j0 = j(); val t0 = System.nanoTime()
      val df = fn(spark, sf)
      val t1 = System.nanoTime(); val j1 = j()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime(); val j2 = j()
      println(f"[annprof] $q%-24s rep$rep build=${(t1 - t0) / 1e9}%6.3f s (${j1 - j0}%2d jobs)  " +
        f"action=${(t2 - t1) / 1e9}%6.3f s (${j2 - j1}%2d jobs)")
    }
    spark.stop()
  }
}
