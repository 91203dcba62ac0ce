package graft

/** Discriminating probe for the RESIDUAL bench-context codegen churn
  * (r19): CodegenChurnAB shows q_dedup_groups converging to ~0-16 new
  * classes per re-run in isolation, while the same query inside a
  * Bench family suite loads ~350 classes per re-run with janino-compile
  * stacks caught in-flight by the stall watchdog. The bench differs
  * from the A/B in exactly two ways per run boundary: a System.gc()
  * settle and OTHER queries interleaved between runs. This probe
  * toggles each factor and prints, per run: wall, new classes loaded,
  * and the janino compile-count delta (codegen-cache misses — class
  * loads without compiles would be a different phenomenon).
  *
  * Test/runMain graft.ChurnProbe [query] [sfDir] [nRuns] [gc|nogc]
  *   [interleave query or '-']
  */
object ChurnProbe {
  def main(args: Array[String]): Unit = {
    val q = args.lift(0).getOrElse("q_dedup_groups")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(6)
    val gc = args.lift(3).forall(_ == "gc")
    val inter = args.lift(4).filter(_ != "-")
    val spark = Sessions.local()
    val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
    val jan = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    def noop(name: String): Unit =
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
    for (i <- 1 to n) {
      inter.foreach { iq =>
        Sessions.dropAllCaches(spark)
        noop(iq)
      }
      Sessions.dropAllCaches(spark)
      if (gc) { System.gc(); Thread.sleep(200) }
      val c0 = cls.getTotalLoadedClassCount
      val j0 = jan.getCount
      val t0 = System.nanoTime()
      noop(q)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $q run=$i gc=$gc inter=${inter.getOrElse("-")} " +
        f"wall=$wall%.2f s new_classes=${cls.getTotalLoadedClassCount - c0} " +
        f"janino_compiles=${jan.getCount - j0}")
    }
    spark.stop()
  }
}
