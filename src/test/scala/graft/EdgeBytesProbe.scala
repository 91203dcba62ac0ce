package graft

import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Trues up the 32 B/row constant in ConnectedComponents.edgeParts
  * (r17 ADVICE / r18 verdict item 5): the edge-cache exchange is sized
  * from an ASSERTED per-shuffled-row byte estimate; this probe measures
  * the real thing at the wired pair producer. It builds the
  * q_dedup_groups pair set (ngram Jaccard over documents), eagerly
  * checkpoints it — exactly the dupGroups prologue — then materializes
  * ONLY buildEdges' output. Inside that bracketed window the sole
  * shuffle is the edge repartition exchange, so the listener's
  * shuffle-write delta over the edge-row count IS wire bytes/row.
  * Both widths matter and edgeParts' scaladoc reconciles them: AQE's
  * 64 MB advisory meters the wire-compressed number this probe
  * measures (11.95-13.91 B/row, SCALING_r18), while the constant
  * deliberately sizes to the ~24 B deserialized cache row plus
  * overhead — the cache partition is what spills, so the 32 B rule
  * carries ~2.3x headroom against the wire number.
  *
  * Test/runMain graft.EdgeBytesProbe [sfDir...]
  */
object EdgeBytesProbe {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf10", "/tmp/graft_sf100")
    val spark = Sessions.local()
    val shufW = new AtomicLong(0L)
    val shufRows = new AtomicLong(0L)
    val counted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.failureReason.isEmpty && counted.add(si.stageId)) {
          shufW.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
          shufRows.addAndGet(si.taskMetrics.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def drained(): (Long, Long) = {
      var prev = -1L; var cur = shufW.get(); var waited = 0
      while (cur != prev && waited < 10000) {
        prev = cur; Thread.sleep(400); waited += 400; cur = shufW.get()
      }
      (cur, shufRows.get())
    }
    for (sf <- sfs) {
      Sessions.dropAllCaches(spark)
      val pairs = Dedup.ngramJaccardPairs(
        Tables.documents(spark, sf), maxShingleDf = Some(1000))
      val p = pairs
        .select(col("doc_id_a").cast("long").as("src"), col("doc_id_b").cast("long").as("dst"))
        .localCheckpoint(eager = true)
      val nPairs = p.count()
      drained(); shufW.set(0L); shufRows.set(0L); counted.clear()
      val edges = ConnectedComponents.buildEdges(p)
      val nEdges = edges.count()
      val (bytes, rows) = drained()
      val nParts = edges.rdd.getNumPartitions
      val perRow = if (rows > 0) bytes.toDouble / rows else -1.0
      println(f"[edgebytes] $sf pairs=$nPairs edge_rows=$nEdges " +
        f"shuffle_rows=$rows shuffle_write_bytes=$bytes bytes_per_row=$perRow%.2f " +
        f"edge_parts=$nParts estimate_bytes=${2L * nPairs * 32L}")
      edges.unpersist(blocking = true)
    }
    spark.stop()
  }
}
