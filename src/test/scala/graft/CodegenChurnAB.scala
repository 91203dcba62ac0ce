package graft

/** A/B for the residual generated-source churn (r18): family5 measured
  * ~1,500 NEW classes loaded per RE-run of q_dedup_groups even with the
  * 4096-entry codegen cache — the source itself varies run to run, so
  * the cache cannot hit. Suspect: spark.sql.codegen.useIdInClassName
  * (default true) embeds the whole-stage codegenStageId in the
  * generated CLASS NAME (cache-key-relevant source text, unlike the
  * comment), and under AQE + the CC round loop the id assignment order
  * is runtime-dependent — so identical plans compile to differently
  * NAMED classes. This alternates the conf per run block inside one
  * JVM and prints wall + loaded-class deltas; flat class counts on the
  * false side confirm the mechanism.
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
    def runOnce(tag: String): Unit = {
      Sessions.dropAllCaches(spark)
      val c0 = cls.getTotalLoadedClassCount
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[churn] $tag wall=$wall%.2f s new_classes=${cls.getTotalLoadedClassCount - c0}")
    }
    for (side <- Seq("true", "false"); i <- 1 to n) {
      spark.conf.set("spark.sql.codegen.useIdInClassName", side)
      runOnce(s"$q useIdInClassName=$side run=$i")
    }
    spark.stop()
  }
}
