package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Adjudicates the r16 lazy-checkpoint audit on its heaviest flipped
  * site (the r15 verdict's requested A/B): dedupSpans' `toks` frame —
  * the checkpointed corpus token arrays — is read by the window chain
  * AND the final span-removal join's probe side, two branches of one
  * job. With a LAZY checkpoint those branches can race the block store
  * and each re-run the corpus text scan + split (the r15
  * ConnectedComponents diagnosis); the shipped operator now
  * materializes `toks` eagerly. This harness interleaves the two
  * shapes in ONE JVM over the same input (the CcShapeAB protocol —
  * alternating runs seconds apart cancel the host's documented
  * day-scale phase term from the ratio):
  *  - A (pre-r16 shape, replicated verbatim minus the flip): the full
  *    dedupSpans pipeline with `localCheckpoint(eager = false)`;
  *  - B (shipped shape): Dedup.dedupSpans, eager `toks`.
  * For A the timed region is the single noop-sink action (construction
  * is free); for B it is construction + action (the eager job runs at
  * build time), so the comparison charges each side its true total.
  * Per-run wall, per-run shuffle bytes (first successful stage attempt,
  * deduped by stageId), and stage counts are reported; a racing A run
  * shows up as extra wall at IDENTICAL logical work, and divergent A
  * wall across pairs is itself the race signature (the scheduler's
  * stage overlap is nondeterministic).
  * Test/runMain graft.CkptRaceAB [sfDir] [nPairs] [k]
  */
object CkptRaceAB {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val nPairs = args.lift(1).map(_.toInt).getOrElse(3)
    val k = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = Sessions.local()

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

    val docs = Tables.documents(spark, sf)
    println(s"[ckptrace] docs: ${docs.count()} from $sf, k=$k")

    // A: the pre-r16 dedupSpans shape, replicated verbatim from the
    // operator source with the ONE difference under test — `toks` stays
    // a LAZY checkpoint. Everything downstream (window expressions,
    // explicit repartition, span gathering, RemoveSpans tail) is the
    // shipped pipeline, so the delta isolates the checkpoint mode.
    def lazyShape(): DataFrame = {
      graft.functions.TokenWindows.register(spark)
      val toks = docs
        .select(col("doc_id").cast("long").as("doc_id"), split(col("text"), " ").as("toks"))
        .localCheckpoint(false)
      val wins = toks
        .selectExpr("doc_id", s"token_windows(concat_ws(' ', toks), $k)")
        .select(col("doc_id"), col("pos"),
          struct(
            xxhash64(col("win")),
            xxhash64(lit(-7046029254386353131L), col("win"))).as("win"))
      val wDup = Window.partitionBy("win")
      val winsR = wins.repartition(col("win"))
      val spanStarts = winsR
        .select(col("doc_id"), col("pos"),
          count(lit(1)).over(wDup).as("c"),
          min(struct(col("doc_id"), col("pos"))).over(wDup).as("canon"))
        .where(col("c") >= 2 && struct(col("doc_id"), col("pos")) =!= col("canon"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("pos"))).as("starts"))
      toks
        .join(spanStarts, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          graft.functions.RemoveSpans.column(
            col("toks"),
            coalesce(col("starts"), expr("cast(array() as array<int>)")),
            k).as("rs"))
        .select(
          col("doc_id"),
          col("rs.clean_text").as("clean_text"),
          col("rs.n_kept").as("n_kept"),
          col("rs.n_removed").as("n_removed"))
    }

    def timed(label: String, build: () => DataFrame): (Double, Double, Long) = {
      Sessions.dropAllCaches(spark)
      drained(); counted.clear(); shufW.set(0L); stages.set(0L)
      val t0 = System.nanoTime()
      // construction INSIDE the timer: side B's eager checkpoint runs
      // its materialization job here — charging it to the run keeps
      // the two sides' totals comparable
      build().write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (bytes, nst) = drained()
      println(f"[ckptrace] $label%-6s wall=$wall%8.2fs shufMB=${bytes / 1e6}%9.1f stages=$nst")
      (wall, bytes / 1e6, nst)
    }

    // one untimed warm-up per side (JIT/janino + AQE plan compile)
    timed("warmA", lazyShape)
    timed("warmB", () => Dedup.dedupSpans(docs, k))
    val runs = (1 to nPairs).map { i =>
      val a = timed(s"A$i", lazyShape)
      val b = timed(s"B$i", () => Dedup.dedupSpans(docs, k))
      (a, b)
    }
    val bestA = runs.map(_._1._1).min; val bestB = runs.map(_._2._1).min
    val worstA = runs.map(_._1._1).max; val worstB = runs.map(_._2._1).max
    val shufA = runs.map(_._1._2).min; val shufB = runs.map(_._2._2).min
    // drift gate BEFORE the SUMMARY line (ADVICE r16): side A is the
    // PRE-audit shape reconstructed by hand, and the whole comparison
    // rests on both sides doing identical logical work — the r16
    // artifact run measured 956.1 MB on BOTH. If dedupSpans' internals
    // move (stage count, checkpoint placement, pair shaping), A would
    // silently measure a shape that corresponds to no shipped history;
    // shuffle bytes are deterministic per plan+data, so a >1% split is
    // drift, not noise — fail loudly. The gate must precede the
    // SUMMARY println because the log parser regex-scrapes SUMMARY
    // regardless of exit status (the campaign runner's FAILED marker
    // goes to campaign stdout, not this log): printing first let a
    // drift-detected run's ratios be mechanically ingested into the
    // artifact anyway.
    require(shufA > 0 && math.abs(shufA - shufB) / math.max(shufA, shufB) < 0.01,
      f"lazy/eager shuffle diverged (A=$shufA%.1f MB, B=$shufB%.1f MB): the " +
        "hand-reconstructed pre-audit shape no longer matches dedupSpans — " +
        "update CkptRaceAB's lazyShape before trusting its ratios")
    println(f"[ckptrace] SUMMARY lazyA best=$bestA%.2f worst=$worstA%.2f " +
      f"eagerB best=$bestB%.2f worst=$worstB%.2f " +
      f"bestRatioB/A=${bestB / bestA}%.3f shufMB A=$shufA%.1f B=$shufB%.1f")
    spark.stop()
  }
}
