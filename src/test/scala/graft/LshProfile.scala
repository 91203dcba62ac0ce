package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch profiler for the embedding-LSH bucket distribution — run
  * manually with Test/runMain graft.LshProfile [sfDir...]. Prints, per
  * scale: vector count, effective bits, occupied buckets, capped-bucket
  * count, and the total in-bucket pair space Σ c·(c−1)/2 (the compute
  * the CosinePairs kernel performs) — the number that must scale
  * linearly for the operator's 100 TB claim to hold.
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    for (dir <- dirs) {
      val emb = Tables.embeddings(spark, dir)
      val e = Similarity.withNorm(emb).localCheckpoint(false)
      val n = e.count()
      val (tables, bits, target, cap) = (16, 4, 128, 4096)
      val effBits = math.max(bits, math.ceil(
        math.log(math.max(1.0, n.toDouble / target)) / math.log(2.0)).toInt)
      val planes = Similarity.hyperplanes(Similarity.dimOf(emb), tables, effBits)
      val buckets = e.select(
        col("vec_id"),
        posexplode(graft.functions.HyperplaneBuckets.buckets(col("v"), planes, tables, effBits)))
        .toDF("vec_id", "tbl", "bucket")
      val sizes = buckets.groupBy("tbl", "bucket").agg(count(lit(1)).as("c"))
      val stats = sizes.agg(
        count(lit(1)).as("occupied"),
        sum(when(col("c") > cap, 1L).otherwise(0L)).as("over_cap"),
        sum(when(col("c") <= cap, (col("c") * (col("c") - 1) / 2).cast("long")).otherwise(0L)).as("pairs"),
        max(col("c")).as("max_bucket"),
        expr("approx_percentile(c, array(0.5, 0.99))").as("p50_p99")).head()
      println(s"[lshprof] $dir n=$n effBits=$effBits occupied=${stats.getLong(0)} " +
        s"overCap=${stats.getLong(1)} pairSpace=${stats.getLong(2)} " +
        s"maxBucket=${stats.getLong(3)} p50/p99=${stats.get(4)}")
    }
    spark.stop()
  }
}
