package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

/** Scratch stage profiler for the exact-Jaccard pipeline at the scale
  * dirs — Test/runMain graft.NgramProfile [sfDir]. Isolates the string
  * inverted index (build + distinct), its hashed twin, and the full
  * pair pipeline, to attribute the sf10 super-linearity before
  * restructuring.
  */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    def time(name: String)(df: => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val t = math.min(run(), run())
      println(f"[prof] $name%-24s $t%.3f s")
    }
    val docs = Tables.documents(spark, sf)
    time("shingleIndex(str)")(Dedup.shingleIndex(docs))
    time("mixedShingleIndex(hash)")(Dedup.mixedShingleIndex(docs))
    time("ngram_full")(Dedup.ngramJaccardPairs(docs, maxShingleDf = Some(1000)))
    spark.stop()
  }
}
