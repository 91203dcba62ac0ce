package graft

import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Adjudicates the r14 CC round fusion's wall-clock effect (r14 verdict
  * item 2): BENCH_r14 showed q_dedup_groups 3410 -> 4157 ms against the
  * fusion commit's "par-to-slightly-better", but cross-round absolute
  * times on this host carry documented 1.25-5x day-scale bimodality —
  * so this harness interleaves FULL propagation runs of the two round
  * shapes in ONE JVM over the SAME materialized pair set (the upstream
  * ngram derivation, which dominates the wired query, is excluded so
  * the CC delta isn't diluted):
  *  - A (r13 shape, replicated verbatim from the pre-fusion source):
  *    per round, neighbor-min join+groupBy, then a SECOND sort-merge
  *    left-join back onto the labels with least/coalesce;
  *  - B (shipped r14 shape): ConnectedComponents.dupGroups — one join,
  *    one partial-aggregated min over (self ∪ neighbor) labels.
  * Reports per-run wall, per-run shuffle bytes (first successful stage
  * attempt, deduped by stageId), and stage counts. Interleaving cancels
  * the host phase term; shuffle/stages are the deterministic signal.
  * Test/runMain graft.CcShapeAB [sfDir] [nPairs]
  */
object CcShapeAB {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nPairs = args.lift(1).map(_.toInt).getOrElse(4)

    val shufW = new AtomicLong(0L)
    val stages = new AtomicLong(0L)
    val counted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.failureReason.isEmpty && counted.add(si.stageId)) {
          shufW.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
          stages.incrementAndGet()
        }
      }
    })
    def drained(): (Long, Long) = {
      var prev = (-1L, -1L); var cur = (shufW.get(), stages.get()); var waited = 0
      while (cur != prev && waited < 10000) {
        prev = cur; Thread.sleep(400); waited += 400; cur = (shufW.get(), stages.get())
      }
      cur
    }

    // materialize the wired pair set ONCE (same producer as
    // q_dedup_groups), to parquet so both sides read identical bytes
    // with no upstream lineage in the timed region
    val pairsPath = "/tmp/ccshape_pairs"
    Dedup.ngramJaccardPairs(Tables.documents(spark, sf), maxShingleDf = Some(1000))
      .write.mode("overwrite").parquet(pairsPath)
    val pairs = spark.read.parquet(pairsPath)
    println(s"[ccshape] pairs: ${pairs.count()} from $sf")

    /** The r13 propagation loop, replicated verbatim from the
      * pre-fusion ConnectedComponents (commit 161068e's parent): same
      * edge cache, same lazy-checkpoint/label-sum discipline, only the
      * round body differs — nbrMin join+agg then a second left join
      * with least/coalesce (and no merge hint, as shipped then).
      */
    def oldDupGroups(p0: DataFrame): DataFrame = {
      val p = p0.select(col("doc_id_a").cast("long").as("src"),
        col("doc_id_b").cast("long").as("dst")).localCheckpoint(eager = false)
      val edges = ConnectedComponents.buildEdges(p)
      var labels = edges.select(col("src").as("v")).distinct()
        .withColumn("label", col("v")).localCheckpoint(eager = false)
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      var prevSum = labelSum(labels)
      var converged = prevSum == null
      var iter = 0
      while (!converged) {
        iter += 1
        require(iter <= 50, "old-shape CC did not converge")
        val nbrMin = edges.join(labels, edges("src") === labels("v"))
          .groupBy(edges("dst"))
          .agg(min(col("label")).as("nbr_label"))
        val updated = labels.join(nbrMin, labels("v") === nbrMin("dst"), "left")
          .select(labels("v"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
          .localCheckpoint(eager = false)
        val s = labelSum(updated)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = updated
      }
      edges.unpersist(blocking = false)
      labels.select(col("v").as("doc_id"), col("label").as("group_id"))
    }

    def run(tag: String, body: => DataFrame): (Double, Long, Long) = {
      Sessions.dropAllCaches(spark)
      drained(); shufW.set(0L); stages.set(0L)
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (bytes, st) = drained()
      (wall, bytes >> 20, st)
    }

    // one warm run per side (AQE/codegen caches), then interleaved pairs
    run("warmA", oldDupGroups(pairs)); run("warmB", ConnectedComponents.dupGroups(pairs))
    var bestA = Double.MaxValue; var bestB = Double.MaxValue
    var shA = Long.MaxValue; var shB = Long.MaxValue
    var stA = 0L; var stB = 0L
    for (p <- 1 to nPairs) {
      val (wa, ma, sa) = run("A", oldDupGroups(pairs))
      val (wb, mb, sb) = run("B", ConnectedComponents.dupGroups(pairs))
      bestA = math.min(bestA, wa); bestB = math.min(bestB, wb)
      shA = math.min(shA, ma); shB = math.min(shB, mb); stA = sa; stB = sb
      println(f"[ccshape] pair=$p r13=$wa%.3f s/${ma}MB/${sa}st r14=$wb%.3f s/${mb}MB/${sb}st")
    }
    println(f"[ccshape] RESULT r13best=$bestA%.3f r14best=$bestB%.3f " +
      f"ratio=${bestB / bestA}%.3f shuf r13=${shA}MB r14=${shB}MB " +
      s"stages r13=$stA r14=$stB")
    spark.stop()
  }
}
