package graft

import graft.operators.Dedup

/** Scratch: print minhash's executed plan after one run (AQE-final),
  * to see which verify-join side exchanges. Test/runMain
  * graft.MinhashExplain [sfDir]
  */
object MinhashExplain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.lift(0).getOrElse("/tmp/graft_sf1")
    val df = Dedup.minhashLshPairs(Tables.documents(spark, sf))
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
