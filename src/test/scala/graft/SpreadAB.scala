package graft

/** Interleaved same-JVM A/B for the r19 [[graft.operators.CpuSpread]]
  * guard: per query, alternate `spark.graft.cpuSpread.enabled`
  * true/false run by run (both sides share warm-up, JIT and cache
  * state symmetrically — the CodegenChurnAB r19 interleaving lesson),
  * drop caches before every run, and report each side's best + median.
  * Cross-run bench deltas at the 100-400 ms level are inside host
  * noise; this is the harness that prices the guard honestly.
  *
  * Test/runMain graft.SpreadAB <query[,query...]> [sfDir] [runsPerSide]
  */
object SpreadAB {
  def main(args: Array[String]): Unit = {
    val qs = args.lift(0).getOrElse("q_corpus_clean").split(",").map(_.trim).filter(_.nonEmpty)
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = Sessions.local()
    def runOnce(q: String): Double = {
      Sessions.dropAllCaches(spark)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- qs) {
      val acc = Map("true" -> scala.collection.mutable.ArrayBuffer[Double](),
        "false" -> scala.collection.mutable.ArrayBuffer[Double]())
      // one untimed warm-up per side so neither side eats the cold plan
      for (side <- Seq("true", "false")) {
        spark.conf.set("spark.graft.cpuSpread.enabled", side)
        runOnce(q)
      }
      for (i <- 1 to n; side <- Seq("true", "false")) {
        spark.conf.set("spark.graft.cpuSpread.enabled", side)
        acc(side) += runOnce(q)
      }
      for (side <- Seq("true", "false")) {
        val v = acc(side).toVector.sorted
        println(f"[spreadab] $q spread=$side best=${v.head}%.3f s " +
          f"median=${v(v.size / 2)}%.3f s runs=${v.map(x => f"$x%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
