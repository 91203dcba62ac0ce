package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding near-dup recall floor at scale (r10, VERDICT item 5;
  * extended r11 per VERDICT item 3; r15 adds the IVF sibling):
  * recall of [[Dedup.embeddingNearDupsLsh]] AND
  * [[Dedup.embeddingNearDupsIvf]] vs the exact operator at the given
  * dirs, plus the precision invariant (no pair the exact path lacks).
  *
  * Two protocols, switched on corpus size:
  *  - ≤ 50k vectors: the full O(n²) exact pass (sf1's 20k is the
  *    practical ceiling locally);
  *  - above: SAMPLED exact — a deterministic ~2k-query hash sample
  *    (xxhash64(vec_id) stride, no RNG, reproducible across runs), each
  *    query's exact ≥-threshold neighbors via ONE broadcast
  *    nested-loop scan (2k × n cosines, codegen'd dot products —
  *    seconds, not the out-of-reach n²), and recall of the LSH pair set
  *    RESTRICTED to pairs touching a sampled query. This measures the
  *    metric r10 proved collapses silently (0.951 → 0.376 over one
  *    decade) at the decade where theory was previously asserted
  *    unmeasured ("theoretical 0.851" in SCALING_r10).
  *
  * Estimator note: restricting both numerator and denominator to
  * query-touching pairs is an unbiased per-pair recall estimate —
  * each true pair's inclusion depends only on its endpoints' hashes,
  * which are uniform and independent of the LSH's hyperplane seeds.
  * Test/runMain graft.RecallProfile [dirs...]
  */
object RecallProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val threshold = 0.4 // both operators' default — keep in sync
    for (dir <- dirs) {
      val emb = Tables.embeddings(spark, dir)
      val n = emb.count()
      def pairSet(df: DataFrame) = df.select("vec_id_a", "vec_id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      if (n <= 50000) {
        val t0 = System.nanoTime()
        val exact = pairSet(Dedup.embeddingNearDupsExact(emb, threshold))
        val t1 = System.nanoTime()
        for ((tag, df) <- Seq(
            "lsh" -> Dedup.embeddingNearDupsLsh(emb, threshold),
            "ivf" -> Dedup.embeddingNearDupsIvf(emb, threshold))) {
          val ta = System.nanoTime()
          val got = pairSet(df)
          val tb = System.nanoTime()
          val extra = (got -- exact).size
          val recall = if (exact.isEmpty) 1.0 else exact.count(got).toDouble / exact.size
          println(f"[recall] $dir n=$n $tag exact=${exact.size} got=${got.size} extra=$extra " +
            f"recall=$recall%.4f exact_s=${(t1 - t0) / 1e9}%.1f approx_s=${(tb - ta) / 1e9}%.1f")
        }
      } else {
        val stride = math.max(1L, n / 2000L)
        val e = Similarity.withNorm(emb).localCheckpoint(false)
        val sample = e.filter(pmod(xxhash64(col("vec_id")), lit(stride)) === 0L)
        val qids = sample.select("vec_id").collect().map(_.getLong(0)).toSet
        val t0 = System.nanoTime()
        val exactS = e.join(
            broadcast(sample.select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))),
            col("vec_id") =!= col("qid"))
          .withColumn("cosine", Similarity.cosine(col("qv"), col("v"), col("qn"), col("norm")))
          .filter(col("cosine") >= threshold)
          .select(least(col("qid"), col("vec_id")).as("vec_id_a"),
            greatest(col("qid"), col("vec_id")).as("vec_id_b"))
          .distinct()
        val exact = pairSet(exactS)
        val t1 = System.nanoTime()
        // restrict to query-touching pairs IN THE PLAN (an InSet over
        // the ~2k sampled ids), never a full-pair-set collect: at sf10
        // the full set is ~17M driver Rows and the next decade makes it
        // GBs — the restricted estimator is identical either way
        val qidSeq = qids.toSeq
        for ((tag, df) <- Seq(
            "lsh" -> Dedup.embeddingNearDupsLsh(emb, threshold),
            "ivf" -> Dedup.embeddingNearDupsIvf(emb, threshold))) {
          val ta = System.nanoTime()
          val got = pairSet(df
            .filter(col("vec_id_a").isin(qidSeq: _*) || col("vec_id_b").isin(qidSeq: _*)))
          val tb = System.nanoTime()
          // precision leg stays FULL-set: any approx pair outside the
          // exact RESTRICTED set but touching a query is a true extra
          val extra = (got -- exact).size
          val recall = if (exact.isEmpty) 1.0 else exact.count(got).toDouble / exact.size
          println(f"[recall] $dir n=$n $tag SAMPLED queries=${qids.size} exact_touching=${exact.size} " +
            f"got_touching=${got.size} extra=$extra recall=$recall%.4f " +
            f"exact_s=${(t1 - t0) / 1e9}%.1f approx_s=${(tb - ta) / 1e9}%.1f")
        }
      }
    }
    spark.stop()
  }
}
