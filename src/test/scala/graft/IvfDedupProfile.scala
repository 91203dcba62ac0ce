package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Measures the IVF embedding near-dup path (r15) against the exact
  * operator: recall (exact pairs recovered), precision (should be 1.0
  * — emitted pairs are exact-verified), wall, and shuffle bytes; and
  * against the LSH sibling's wall/shuffle at the same scale. The probe
  * grid (probes × cellFactor) maps the recall/shuffle trade so the
  * wired defaults are chosen from data, not vibes.
  * Test/runMain graft.IvfDedupProfile [sfDir] [probesCsv] [cellFactorsCsv]
  */
object IvfDedupProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probesGrid = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(4, 8, 16))
    val cfGrid = args.lift(2).map(_.split(",").map(_.toDouble).toSeq).getOrElse(Seq(1.0))
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
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("vec_id_a", "vec_id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // past the local O(n^2) ceiling, use RecallProfile's sampled-exact
    // estimator (deterministic ~2k-query hash sample, restricted pairs)
    val sampledQids: Option[Set[Long]] = if (n <= 50000) None else {
      val stride = math.max(1L, n / 2000L)
      Some(emb.filter(pmod(xxhash64(col("vec_id")), lit(stride)) === 0L)
        .select("vec_id").collect().map(_.getLong(0)).toSet)
    }
    def restricted(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      sampledQids match {
        case Some(q) =>
          val qs = q.toSeq
          df.filter(col("vec_id_a").isin(qs: _*) || col("vec_id_b").isin(qs: _*))
        case None => df
      }
    val exact = sampledQids match {
      case None => pairsOf(Dedup.embeddingNearDupsExact(emb))
      case Some(q) =>
        val threshold = 0.4
        val e = graft.operators.Similarity.withNorm(emb).localCheckpoint(false)
        val qs = q.toSeq
        val sample = e.filter(col("vec_id").isin(qs: _*))
        pairsOf(e.join(
            broadcast(sample.select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))),
            col("vec_id") =!= col("qid"))
          .withColumn("cosine",
            graft.operators.Similarity.cosine(col("qv"), col("v"), col("qn"), col("norm")))
          .filter(col("cosine") >= threshold)
          .select(least(col("qid"), col("vec_id")).as("vec_id_a"),
            greatest(col("qid"), col("vec_id")).as("vec_id_b"))
          .distinct())
    }
    println(s"[ivfprof] $sf n=$n sampled=${sampledQids.isDefined} exact_pairs=${exact.size}")

    def run(tag: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      Sessions.dropAllCaches(spark)
      drained(); shufW.set(0L)
      val t0 = System.nanoTime()
      val got = pairsOf(restricted(df))
      val wall = (System.nanoTime() - t0) / 1e9
      val mb = drained() >> 20
      val recall = if (exact.isEmpty) 1.0 else (exact & got).size.toDouble / exact.size
      val precision = if (got.isEmpty) 1.0 else (exact & got).size.toDouble / got.size
      println(f"[ivfprof] $tag recall=$recall%.4f precision=$precision%.4f " +
        f"wall=$wall%.2f s shuffle=${mb}MB pairs=${got.size}")
    }
    run("lsh", Dedup.embeddingNearDupsLsh(emb))
    for (cf <- cfGrid; p <- probesGrid)
      run(s"ivf p=$p cf=$cf", Dedup.embeddingNearDupsIvf(emb, probes = p, cellFactor = cf))
    spark.stop()
  }
}
