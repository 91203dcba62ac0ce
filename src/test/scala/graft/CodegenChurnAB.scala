package graft

/** A/B for the residual generated-source churn (r18): family5 measured
  * ~1,500 NEW classes loaded per RE-run of q_dedup_groups even with the
  * 4096-entry codegen cache — the source itself varies run to run, so
  * the cache cannot hit. Suspect: spark.sql.codegen.useIdInClassName
  * (default true) embeds the whole-stage codegenStageId in the
  * generated CLASS NAME (cache-key-relevant source text, unlike the
  * comment), and under AQE + the CC round loop the id assignment order
  * is runtime-dependent — so identical plans compile to differently
  * NAMED classes. This INTERLEAVES the two conf sides run by run
  * inside one JVM (true,false,true,false,…) and prints wall +
  * loaded-class deltas per run, then a steady-state summary. The two
  * sides' generated sources have disjoint cache keys (the class-name
  * text differs), so each side warms its OWN codegen cache across its
  * runs — but classes below the codegen layer (Spark internals,
  * parquet readers) load once for whichever side runs first, so the
  * per-side comparison is the STEADY-STATE (last-run-per-side) delta
  * the summary prints, not raw early-run deltas (r19, ADVICE: the
  * previous all-true-then-all-false ordering let the false side ride
  * the true side's warm JVM asymmetrically).
  *
  * Test/runMain graft.CodegenChurnAB [query] [sfDir] [runsPerSide]
  */
object CodegenChurnAB {
  def main(args: Array[String]): Unit = {
    val q = args.lift(0).getOrElse("q_dedup_groups")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = Sessions.local()
    val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
    def runOnce(tag: String): (Double, Long) = {
      Sessions.dropAllCaches(spark)
      val c0 = cls.getTotalLoadedClassCount
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val nc = cls.getTotalLoadedClassCount - c0
      println(f"[churn] $tag wall=$wall%.2f s new_classes=$nc")
      (wall, nc)
    }
    val last = scala.collection.mutable.Map[String, (Double, Long)]()
    for (i <- 1 to n; side <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.useIdInClassName", side)
      last(side) = runOnce(s"$q useIdInClassName=$side run=$i")
    }
    for (side <- Seq("true", "false"); (w, nc) <- last.get(side))
      println(f"[churn] STEADY $q useIdInClassName=$side wall=$w%.2f s new_classes=$nc")
    spark.stop()
  }
}
