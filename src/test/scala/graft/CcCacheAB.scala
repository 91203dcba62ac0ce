package graft

import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch A/B for the r12 verdict's CC edge-cache decode watch item
  * (ADVICE #2 / verdict item 3): does reading the persist()ed
  * symmetric edge set every propagation round cost more than a
  * localCheckpoint build would — once the checkpoint's lost
  * partitioning/order makes each round re-exchange AND re-sort the
  * edge side? Alternates the two edge builds round-robin in ONE JVM
  * (machine drift cancels) over the REAL wired pair set, timing the
  * exact nbrMin join+aggregate a propagation round runs.
  * Test/runMain graft.CcCacheAB [sfDir] [rounds]
  */
object CcCacheAB {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sf), maxShingleDf = Some(1000))
    val p = pairs.select(col("doc_id_a").cast("long").as("src"),
      col("doc_id_b").cast("long").as("dst")).localCheckpoint(false)
    println(s"[ccab] pairs: ${p.count()}")

    // A: the shipped shape — persist() keeps hashpartitioning(src)+sort
    val edgesA = ConnectedComponents.buildEdges(p)
    // B: localCheckpoint build — materialized rows, but the LogicalRDD
    // reports Unknown partitioning, so every round pays
    // ENSURE_REQUIREMENTS again on the edge side
    val edgesB = p.union(p.select(col("dst"), col("src")))
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(false)
    edgesA.count(); edgesB.count()
    val labels = edgesA.select(col("src").as("v")).distinct()
      .withColumn("label", col("v")).localCheckpoint(false)
    println(s"[ccab] labels: ${labels.count()}")

    def round(e: DataFrame): Double = {
      val t0 = System.nanoTime()
      e.join(labels, e("src") === labels("v"))
        .groupBy(e("dst")).agg(min(col("label")).as("nbr_label"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    round(edgesA); round(edgesB) // warm both shapes before any timed pair
    for (r <- 1 to rounds) {
      val ta = round(edgesA)
      val tb = round(edgesB)
      println(f"[ccab] round=$r persist=$ta%.3f s ckpt=$tb%.3f s")
    }
    spark.stop()
  }
}
