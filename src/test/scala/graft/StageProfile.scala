package graft

import graft.operators.{CorpusPipeline, Dedup}
import org.apache.spark.sql.DataFrame

/** Scratch stage profiler for the dedup-heavy bench queries — run
  * manually with Test/runMain graft.StageProfile. Times each building
  * block of q_corpus_clean / q_dedup_minhash_lsh at sf0.1 (warm, best
  * of 2 noop materializations).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = "/root/testdata/sf0.1"
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
    time("shingleIndex")(Dedup.shingleIndex(docs))
    time("minhash_full")(Dedup.minhashLshPairs(docs))
    time("simhash_full")(Dedup.simhashPairs(docs))
    time("exactDups")(Dedup.exactDups(docs))
    time("corpus_clean")(CorpusPipeline.cleanCorpus(docs).drop("text"))
    spark.stop()
  }
}
