package graft

import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cardinality attribution for the exact-Jaccard pair join at the scale
  * dirs — Test/runMain graft.NgramProfile2 [sfDirs...]. Prints, per
  * dir: postings, distinct shingles, Σdf² (the self-join's output
  * volume), and the distinct candidate-pair count (what the groupBy
  * exchange carries) — the quantity that must scale linearly.
  */
object NgramProfile2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    for (sf <- dirs) {
      val inv = Dedup.shingleIndex(Tables.documents(spark, sf)).localCheckpoint(false)
      val postings = inv.count()
      val w = Window.partitionBy("shingle")
      val capped = inv.withColumn("df", count(lit(1)).over(w))
        .filter(col("df") <= 1000).drop("df").localCheckpoint(false)
      val dfStats = capped.groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(count(lit(1)).as("shingles"),
          sum((col("df") * col("df")).cast("long")).as("sum_df2"),
          max(col("df")).as("max_df")).head()
      val pairs = capped.select(col("shingle"), col("doc_id").as("a"))
        .join(capped.select(col("shingle"), col("doc_id").as("b")), Seq("shingle"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct().count()
      println(s"[prof2] $sf postings=$postings shingles=${dfStats.getLong(0)} " +
        s"sum_df2=${dfStats.getLong(1)} max_df=${dfStats.getLong(2)} distinct_pairs=$pairs")
    }
    spark.stop()
  }
}
