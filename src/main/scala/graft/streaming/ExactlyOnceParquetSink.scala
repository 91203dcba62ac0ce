package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once parquet sink for Structured Streaming.
  *
  * `foreachBatch` is at-least-once: after a failure the engine replays
  * the last micro-batch, so a plain parquet append would duplicate it.
  * Exactly-once here is the standard idempotent-commit construction:
  *  - each micro-batch writes to its own `batch=<id>` directory
  *    (mode=overwrite, so a replay of a HALF-written batch rewrites it
  *    cleanly rather than appending);
  *  - a batch id is then recorded in `_commits/<id>` — creation is the
  *    atomic commit point;
  *  - a replayed batch whose id is already committed is skipped before
  *    any write;
  *  - [[read]] unions ONLY committed batch directories, so a crash
  *    between write and commit leaves invisible garbage, never
  *    duplicate or torn rows.
  *
  * At scale this is a metadata-log table in miniature (the pattern
  * behind Delta/Iceberg commit logs and Spark's own
  * FileStreamSinkLog): the commit log is tiny (one empty file per
  * batch), data files are immutable once committed, and readers never
  * lock. The local-filesystem marker here generalizes to any store
  * with atomic put-if-absent.
  */
object ExactlyOnceParquetSink {

  /** Partition-count ceiling below which a micro-batch is probed for
    * row-emptiness before writing (see [[writeBatch]]). Sized well above
    * any sane `spark.sql.shuffle.partitions` so idle-stream batches are
    * always pruned; batches wider than this are assumed real work.
    */
  private val EmptyProbeMaxPartitions = 512

  /** Start the stream, writing micro-batches exactly-once under
    * `outDir` with engine checkpointing in `checkpointDir`.
    */
  def start(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, batchId: Long) => writeBatch(batch, outDir, batchId))
      .start()

  /** Idempotent micro-batch write: skip if committed, else overwrite
    * the batch dir then atomically create the commit marker.
    */
  private[streaming] def writeBatch(batch: DataFrame, outDir: String, batchId: Long): Unit = {
    val commits = Paths.get(outDir, "_commits")
    Files.createDirectories(commits)
    val marker = commits.resolve(batchId.toString)
    if (!Files.exists(marker)) {
      // Empty-batch guards, cheapest first. ZERO partitions (a pure
      // watermark-advancing trigger) is plan-side and free: parquet
      // would write a batch dir with NO part files, and schema
      // inference over that dir poisons the read() union for every
      // committed batch. A row-empty batch WITH partitions (idle
      // stateful streams emit these with the full shuffle fan-out) is
      // merely wasteful — each writes a batch=N dir of schema-only
      // part files plus a marker, accumulating forever on an idle
      // stream — so it is worth a row-emptiness probe. The probe and
      // the write are SEPARATE actions over the same micro-batch
      // plan, and isEmpty's limit-1 only short-circuits the final
      // stage — upstream shuffle map stages re-execute in full — so
      // the batch is persisted across probe+write: the lineage runs
      // once, the probe reads the first cached block, and the write
      // drains the cache. The partition ceiling merely bounds what
      // the probe is willing to scan; batches wider than any sane
      // shuffle fan-out skip straight to the write, unpersisted.
      val parts = batch.rdd.getNumPartitions
      if (parts == 0) return
      if (parts <= EmptyProbeMaxPartitions) {
        batch.persist()
        try {
          if (batch.isEmpty) return
          batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        } finally batch.unpersist(blocking = true)
      } else {
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      Files.createFile(marker)
    }
  }

  /** The committed prefix of the sink: union of exactly the batch dirs
    * whose commit marker exists. Uncommitted (torn) writes are invisible.
    */
  def read(spark: SparkSession, outDir: String): DataFrame = {
    val commits = Paths.get(outDir, "_commits")
    val ids =
      if (!Files.exists(commits)) Seq.empty[String]
      else {
        val s = Files.list(commits)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString).toSeq
        } finally s.close()
      }
    require(ids.nonEmpty, s"no committed batches under $outDir")
    spark.read.parquet(ids.sorted.map(id => s"$outDir/batch=$id"): _*)
  }
}
