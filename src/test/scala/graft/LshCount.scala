package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Scratch output-mass probe for the r13 quantized LSH prefilter: the
  * VERIFIED distinct-pair count at a scale dir — the number the
  * SCALING_r13 output-bound adjudication rides on (8.55 M at sf10,
  * 76.56 M at sf30). The intermediate volumes the adjudication also
  * cites (bucketed rows, pre-distinct candidate stream) were read off
  * QueryProfile's per-stage shuffle rows/bytes, not printed here — use
  * `Test/runMain graft.QueryProfile q_dedup_embedding_lsh <sfDir>` to
  * replay those. Test/runMain graft.LshCount [sfDir]
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
