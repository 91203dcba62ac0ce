package graft

/** Shuffle-codec probe (guide §2.3 "measure shuffle bytes written and
  * stage time with each" — the one §2.3 lever this engine had never
  * priced). `spark.io.compression.codec` is a CORE conf fixed at
  * SparkEnv creation, so unlike KnobAB it cannot alternate inside one
  * JVM: each invocation measures ONE codec (injected via system
  * property before the session exists) and the harness interleaves
  * JVMs lz4/zstd/lz4/zstd so host drift cancels across pairs. Per
  * query it reports every timed wall plus the final run's total
  * shuffle bytes written/read and executor CPU (listener-summed).
  * Bytes ratios are host-noise-immune — the codec compresses the same
  * shuffle payload regardless of steal — which is why they, not the
  * cross-JVM walls, carry the decision weight.
  *
  * Test/runMain graft.CodecAB <codec> [sfDir] [q1,q2,...] [nRuns]
  */
object CodecAB {
  def main(args: Array[String]): Unit = {
    val codec = args.lift(0).getOrElse("lz4")
    val sf = args.lift(1).getOrElse("/tmp/graft_sf10")
    val qs = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q_dedup_ngram_jaccard", "q_dedup_groups", "q_corpus_clean_full"))
    val n = args.lift(3).map(_.toInt).getOrElse(3)
    // SparkConf reads spark.* system properties at construction — the
    // only way to vary a core conf without touching Sessions.local
    System.setProperty("spark.io.compression.codec", codec)
    val spark = Sessions.local()
    require(spark.sparkContext.getConf.get("spark.io.compression.codec") == codec,
      "codec did not take; a SparkContext already existed in this JVM?")

    val shufW = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val tm = sc.stageInfo.taskMetrics
        shufW.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
        shufR.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
        cpuMs.addAndGet(tm.executorCpuTime / 1000000L)
      }
    })

    qs.foreach { q =>
      val fn = SparkEntry.queries(q)
      def run(): Double = {
        Sessions.dropAllCaches(spark)
        System.gc() // free tmpfs shuffle files between big-SF runs
        val t0 = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm at the target scale, untimed
      val walls = (1 to n).map { i =>
        if (i == n) { // meter exactly one steady run's bytes/cpu
          // drain BEFORE the reset too (r19 ADVICE): listener events
          // are async, so late onStageCompleted events from run n-1
          // landing after the reset would inflate the metered run's
          // bytes/cpu — the very numbers that carry the codec decision
          Thread.sleep(500)
          shufW.set(0); shufR.set(0); cpuMs.set(0)
        }
        run()
      }
      // listener events are async; let the bus drain before reading
      Thread.sleep(500)
      println(f"[codec] codec=$codec%-4s q=$q%-24s walls=${walls.map(w => f"$w%.2f").mkString(",")} " +
        f"shufW=${shufW.get >> 20}MB shufR=${shufR.get >> 20}MB cpu=${cpuMs.get / 1000.0}%.1f s")
    }
    spark.stop()
  }
}
