package graft

/** Scratch A/B for spark.sql.files.maxPartitionBytes at sf1 (r10): the
  * heavy-set sf1 numbers for q_dedup_groups / q_decontaminate /
  * q_dedup_spans read ~2x worse than SCALING_r9's (measured under the
  * since-reverted session-global 8m). Alternates the knob at runtime in
  * ONE JVM (it is a runtime SQL conf) so machine drift cancels.
  * Test/runMain graft.KnobAB [sfDir] [queryName]
  */
object KnobAB {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.lift(0).getOrElse("/tmp/graft_sf1")
    val q = args.lift(1).getOrElse("q_dedup_groups")
    val fn = SparkEntry.queries(q)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm the JVM once before any timed pair
    for (round <- 1 to 3; mpb <- Seq("134217728", "8388608")) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      val t = math.min(run(), run())
      println(f"[ab] $q round=$round mpb=${if (mpb == "8388608") "8m" else "128m"}%-4s best2=$t%.2f s")
    }
    spark.stop()
  }
}
