package graft

import graft.operators.Decontaminate
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Fourth-decade probe for decontamination under the REALISTIC scale
  * shape: a FIXED eval set against a growing corpus. The wired
  * q_decontaminate derives its eval set proportionally (`doc_id % 7`),
  * which is a harness artifact — real eval benchmarks are fixed-size
  * by construction (the whole premise of the r14 broadcast-probe
  * kernel, `EvalContainment.scala`). Proportional eval at sf100 walks
  * the driver-side index into the kernel's documented 2 GiB ceiling
  * (`require` at EvalContainment.build) — an intended hard error, not
  * a scale path; this harness measures the path the design actually
  * claims: eval pinned to the SMALL dir's `% 7 == 0` slice on BOTH
  * sides, corpus = each dir's `% 7 != 0` slice, so only the corpus
  * grows across the decade. ScaleUp replica suffixes for r < the small
  * factor are byte-identical across the two dirs, so the fixed eval
  * set keeps real matches in the big corpus (non-degenerate overlap).
  *
  * Protocol: same-JVM interleaved pairs (DecadeAB's discipline — warm
  * each side once, then alternate timed runs with cache hygiene;
  * per-stage first-successful-attempt shuffle bytes deduped by
  * stageId as the noise-immune secondary signal). The timed region
  * includes `Decontaminate.flagged`'s eager eval-index build — the
  * index is identical on both sides by construction, so any wall delta
  * is the corpus pass alone.
  *
  * BOTH dirs must be ScaleUp outputs of the SAME source (ADVICE r15):
  * if dirBig were scaled FROM dirSmall, its tokens would be
  * double-suffixed and the fixed eval set would lose its
  * byte-identical twins in the big corpus, hollowing out the probe.
  * The harness cross-checks the premise two ways — the ScaleUp
  * manifests' `src=` lines when present, and requiring the big
  * corpus to flag MORE rows than the small one (a same-source decade
  * multiplies the eval set's replica twins; a re-scaled dirB leaves
  * rowsB at ~the spurious-containment floor).
  *
  * Test/runMain graft.DecontScaleAB [dirSmall] [dirBig] [nPairs]
  */
object DecontScaleAB {
  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/tmp/graft_sf10")
    val dirB = args.lift(1).getOrElse("/tmp/graft_sf100")
    val nPairs = args.lift(2).map(_.toInt).getOrElse(3)

    // same-source premise, manifest half (see scaladoc): compare the
    // ScaleUp manifests' src lines when both exist
    def manifestSrc(dir: String): Option[String] = {
      val p = java.nio.file.Paths.get(dir, "_scaleup_manifest.txt")
      if (!java.nio.file.Files.exists(p)) None
      else java.nio.file.Files.readAllLines(p).toArray(Array.empty[String])
        .collectFirst { case l if l.startsWith("src=") => l.stripPrefix("src=") }
    }
    (manifestSrc(dirA), manifestSrc(dirB)) match {
      case (Some(a), Some(b)) =>
        require(a == b, s"dirA was scaled from $a but dirB from $b — the " +
          "fixed-eval overlap premise needs both dirs scaled from the SAME " +
          "source (a dir scaled from the other loses the eval set's " +
          "byte-identical twins)")
        require(b != dirA, s"dirB was scaled FROM dirA ($dirA) — its tokens " +
          "are double-suffixed and the probe is hollow")
      case _ => System.err.println(
        "[decont] WARNING: ScaleUp manifest missing on one side — cannot " +
          "verify the same-source premise up front; the rowsB > rowsA gate " +
          "below still applies")
    }

    val spark = Sessions.local()

    val shufW = new AtomicLong(0L)
    val counted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.failureReason.isEmpty && counted.add(si.stageId))
          shufW.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    def drained(): Long = {
      var prev = -1L; var cur = shufW.get(); var waited = 0
      while (cur != prev && waited < 10000) {
        prev = cur; Thread.sleep(400); waited += 400; cur = shufW.get()
      }
      cur
    }

    val eval = Tables.documents(spark, dirA).filter(col("doc_id") % 7 === 0)
    def corpus(dir: String) =
      Tables.documents(spark, dir).filter(col("doc_id") % 7 =!= 0)
    def run(dir: String): (Double, Long, Long) = {
      Sessions.dropAllCaches(spark)
      drained(); shufW.set(0L)
      val t0 = System.nanoTime()
      val flagged = Decontaminate.flagged(corpus(dir), eval, minContainment = 0.5)
      val n = flagged.count() // count, not noop: flagged rows are the result
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, drained() >> 20, n)
    }
    System.err.println("[decont] warm A"); run(dirA)
    System.err.println("[decont] warm B"); run(dirB)
    var bestA = Double.MaxValue; var bestB = Double.MaxValue
    var mbA = Long.MaxValue; var mbB = Long.MaxValue
    var nA = -1L; var nB = -1L
    for (p <- 1 to nPairs) {
      val (wa, ma, ra) = run(dirA); bestA = math.min(bestA, wa); mbA = math.min(mbA, ma); nA = ra
      val (wb, mb, rb) = run(dirB); bestB = math.min(bestB, wb); mbB = math.min(mbB, mb); nB = rb
      println(f"[decont] pair=$p A=$wa%.2f s/${ma}MB/${ra}rows B=$wb%.2f s/${mb}MB/${rb}rows")
    }
    println(f"[decont] RESULT fixed-eval bestA=$bestA%.3f bestB=$bestB%.3f " +
      f"wallRatio=${bestB / bestA}%.2f shufA=${mbA}MB shufB=${mbB}MB rowsA=$nA rowsB=$nB")
    // same-source premise, data half (see scaladoc): a genuine decade
    // over one source multiplies the eval twins in the big corpus
    require(nB > nA, s"rowsB=$nB <= rowsA=$nA — the big corpus flags no more " +
      "than the small one, the fixed-eval-overlap premise does not hold " +
      "(dirB likely scaled from dirA, not from their common source); the " +
      "wall/shuffle numbers above do NOT measure the claimed probe")
    spark.stop()
  }
}
