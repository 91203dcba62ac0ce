package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Scratch candidate-volume probe for the r13 quantized LSH prefilter:
  * counts bucketed rows, raw candidate stream (pre-distinct), and
  * verified output at a scale dir. Test/runMain graft.LshCount [sfDir]
  */
object LshCount {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val out = Dedup.embeddingNearDupsLsh(Tables.embeddings(spark, sf))
    println(s"[lshc] verified distinct pairs: ${out.count()}")
    spark.stop()
  }
}
