package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

/** Embedding-LSH recall floor at scale (r10, VERDICT item 5): recall of
  * [[Dedup.embeddingNearDupsLsh]] vs the exact operator at the given
  * dirs, plus the precision invariant (no pair the exact path lacks).
  * Exact is the O(n²) pass — feasible through sf1 (20k vectors); sf10's
  * 200k-vector exact pass is out of local reach, so the scale recall
  * gate rides sf1, one decade past DedupSpec's sf0.001 spec floor.
  * Test/runMain graft.RecallProfile [dirs...]
  */
object RecallProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    for (dir <- dirs) {
      val emb = Tables.embeddings(spark, dir)
      def pairs(df: DataFrame) = df.select("vec_id_a", "vec_id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val t0 = System.nanoTime()
      val exact = pairs(Dedup.embeddingNearDupsExact(emb))
      val t1 = System.nanoTime()
      val lsh = pairs(Dedup.embeddingNearDupsLsh(emb))
      val t2 = System.nanoTime()
      val extra = (lsh -- exact).size
      val recall = if (exact.isEmpty) 1.0 else exact.count(lsh).toDouble / exact.size
      println(f"[recall] $dir exact=${exact.size} lsh=${lsh.size} extra=$extra " +
        f"recall=$recall%.4f exact_s=${(t1 - t0) / 1e9}%.1f lsh_s=${(t2 - t1) / 1e9}%.1f")
    }
    spark.stop()
  }
}
