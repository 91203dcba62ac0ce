package graft.streaming

import java.nio.file.{Files, Paths}
import graft.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** ExactlyOnceParquetSink: committed-prefix reads, replay idempotence,
  * and torn-write invisibility.
  */
class ExactlyOnceSinkSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_sink_$tag")
    d.toString
  }

  test("streamed micro-batches land exactly once and read back complete") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val out = freshDir("out"); val ckpt = freshDir("ckpt")
    val q = ExactlyOnceParquetSink.start(stream.toDF().toDF("id", "v"), out, ckpt)
    try {
      stream.addData((1L, 1.0), (2L, 2.0)); q.processAllAvailable()
      stream.addData((3L, 3.0)); q.processAllAvailable()
    } finally q.stop()
    val got = ExactlyOnceParquetSink.read(spark, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("a replayed batch id is skipped — even with different data") {
    import spark.implicits._
    val out = freshDir("replay")
    ExactlyOnceParquetSink.writeBatch(Seq((1L, 1.0)).toDF("id", "v"), out, 0L)
    // at-least-once delivery replays batch 0; the commit marker wins
    ExactlyOnceParquetSink.writeBatch(Seq((99L, 99.0)).toDF("id", "v"), out, 0L)
    val got = ExactlyOnceParquetSink.read(spark, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 1.0)))
  }

  test("an empty zero-partition micro-batch commits nothing and cannot poison read()") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val out = freshDir("empty")
    ExactlyOnceParquetSink.writeBatch(Seq((1L, 1.0)).toDF("id", "v"), out, 0L)
    // a watermark-only trigger's batch: correct schema, ZERO partitions —
    // written as-is it produces a part-file-less dir that breaks schema
    // inference across the whole committed union
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    assert(empty.rdd.getNumPartitions == 0, "test premise: zero partitions")
    ExactlyOnceParquetSink.writeBatch(empty, out, 1L)
    assert(!Files.exists(Paths.get(out, "_commits", "1")), "empty batch must not commit")
    ExactlyOnceParquetSink.writeBatch(Seq((2L, 2.0)).toDF("id", "v"), out, 2L)
    val got = ExactlyOnceParquetSink.read(spark, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 1.0), (2L, 2.0)))
  }

  test("a row-empty micro-batch WITH partitions writes neither dir nor marker") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = freshDir("rowempty")
    ExactlyOnceParquetSink.writeBatch(Seq((1L, 1.0)).toDF("id", "v"), out, 0L)
    // the idle-stream shape: full shuffle fan-out, zero rows — each one
    // used to land a batch=N dir of schema-only part files plus a
    // marker, accumulating forever on a watermark-advancing stream
    val idle = spark.range(4).select(col("id"), col("id").cast("double").as("v"))
      .filter(col("id") < 0).repartition(8)
    assert(idle.rdd.getNumPartitions == 8, "test premise: partitions, no rows")
    ExactlyOnceParquetSink.writeBatch(idle.toDF("id", "v"), out, 1L)
    assert(!Files.exists(Paths.get(out, "batch=1")), "row-empty batch must not write")
    assert(!Files.exists(Paths.get(out, "_commits", "1")), "row-empty batch must not commit")
    val got = ExactlyOnceParquetSink.read(spark, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 1.0)))
  }

  test("a torn write (no commit marker) is invisible, and its replay heals it") {
    import spark.implicits._
    val out = freshDir("torn")
    ExactlyOnceParquetSink.writeBatch(Seq((1L, 1.0)).toDF("id", "v"), out, 0L)
    // simulate a crash between data write and commit for batch 1
    Seq((2L, 2.0), (2L, 2.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$out/batch=1")
    val before = ExactlyOnceParquetSink.read(spark, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(before == Set((1L, 1.0)), "uncommitted batch dir must be invisible")
    // replay of batch 1 overwrites the torn dir and commits
    ExactlyOnceParquetSink.writeBatch(Seq((2L, 2.0)).toDF("id", "v"), out, 1L)
    val after = ExactlyOnceParquetSink.read(spark, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(after == Set((1L, 1.0), (2L, 2.0)))
    assert(Files.exists(Paths.get(out, "_commits", "1")))
  }
}
