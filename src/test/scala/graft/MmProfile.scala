package graft

import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch stage profiler for q_multimodal_features' building blocks —
  * run manually with Test/runMain graft.MmProfile [sfDir]. Chases the
  * SCALING_r8 11.75x sf1/sf0.1 ratio by timing each stage separately.
  */
object MmProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(name: String)(df: => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val t = math.min(run(), run())
      println(f"[prof] $name%-28s ${t}%.3f s")
    }
    val docs = Tables.documents(spark, sf)
    val pay = Multimodal.withPayload(docs)
    println(s"[prof] sfDir=$sf docs=${docs.count()} " +
      s"parts=${pay.rdd.getNumPartitions}")
    time("payload_scan")(pay)
    time("feature_extract")(Multimodal.featureExtract(pay))
    time("n_bytes_branch")(pay.select(col("doc_id"),
      octet_length(col("payload")).cast("bigint").as("n_bytes")))
    time("feature_summary_full")(Multimodal.featureSummary(pay))
    Multimodal.featureSummary(pay).explain("formatted")
    spark.stop()
  }
}
