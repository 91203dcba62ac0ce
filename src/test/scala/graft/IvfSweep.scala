package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch sweep: IVF recall@10 across (nCentroids, nProbe, lloydIters)
  * on the sf0.01 and sf0.1 embeddings. Not a spec — run manually with
  * Test/runMain graft.IvfSweep.
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val exact = Similarity.annBruteForceTopK(emb).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      for {
        c <- Seq(8, 16, 32)
        p <- Seq(4, 6, 8, 12)
        it <- Seq(1, 3)
        if p <= c
      } {
        val ivf = Similarity.annIvfTopK(emb, nCentroids = c, nProbe = p, lloydIters = it)
          .collect().groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
        val recalls = exact.map { case (q, ids) =>
          ids.count(ivf.getOrElse(q, Set.empty)).toDouble / ids.size
        }
        println(f"[sweep] $sf C=$c%2d probe=$p%2d iters=$it scanfrac=${p.toDouble / c}%.2f " +
          f"recall=${recalls.sum / recalls.size}%.3f")
      }
    }
    spark.stop()
  }
}
