package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir; reads
  * are plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning
  * freedom — callers select narrow columns as early as possible.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` has shipped as two physical types across testdata
    * generations, so the reader adapts on the footer schema (no data
    * read; every downstream operator sees one canonical µs TIMESTAMP):
    *  - parquet TIMESTAMP(NANOS): Spark only reads it as a raw nanos
    *    LongType (spark.sql.legacy.parquet.nanosAsLong=true — set by
    *    [[Sessions]]); convert with explicit FLOOR division (`div` alone
    *    truncates toward zero, which would land pre-1970 nanos 1 µs
    *    above DuckDB's flooring ns→us cast);
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; the NTZ wall clock IS the UTC instant. A bare
    *    cast to TimestampType would interpret the wall clock in the
    *    SESSION time zone (a spark-submit session in Asia/Tokyo would
    *    silently shift every instant −9 h) — and so would every other
    *    built-in route, `to_utc_timestamp(ntz, "UTC")` included (it
    *    session-casts before its shift; measured in SourceFormatsSpec).
    *    The conversion is the native [[graft.functions.NtzAsUtcInstant]]
    *    reinterpret — zero arithmetic, zone-independent, and no session
    *    mutation (r10 pinned `spark.sql.session.timeZone=UTC` as a side
    *    effect of the read; a caller rendering its OWN tables'
    *    timestamps in its own zone got silently shifted output from
    *    that point on).
    *
    * The one remaining conf write, `nanosAsLong`, is read-time-required
    * for the NANOS generation (Spark refuses TIMESTAMP(NANOS) without
    * it), set only when it differs, and logged — it changes how a
    * pathological-schema file reads, never how values render.
    *
    * Any other physical ts type (a future regen producing INT96 or
    * string) fails fast with the observed type instead of flowing
    * wrong-typed values downstream.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // self-healing: callers with their own session (the driver's smoke
    // check) would otherwise hit PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(nanosKey).forall(_ != "true")) {
      org.slf4j.LoggerFactory.getLogger("graft.Tables")
        .info(s"events: setting $nanosKey=true (required to read a TIMESTAMP(NANOS) generation)")
      spark.conf.set(nanosKey, "true")
    }
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(
          expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // pure NTZ→instant reinterpret (see NtzAsUtcInstant: every
        // built-in route casts through the SESSION zone first)
        raw.withColumn("ts", graft.functions.NtzAsUtcInstant.column(col("ts")))
      case org.apache.spark.sql.types.TimestampType => raw // already an instant
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected nanos LONG, " +
          "TIMESTAMP_NTZ, or TIMESTAMP) — testdata generation changed; extend Tables.events")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Schema-explicit CSV reader that round-trips arbitrary text payloads
    * (embedded newlines, quotes, unicode): multiLine + RFC-4180-style
    * doubled-quote escaping. FAILFAST — at 100 TB a PERMISSIVE reader
    * silently nulls corrupt rows, which reads as data loss downstream;
    * fail the task instead.
    */
  def fromCsv(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Schema-explicit JSON-lines reader (nested arrays/structs land as
    * their Spark types, no inference pass over the data). FAILFAST for
    * the same reason as [[fromCsv]].
    */
  def fromJson(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)
}
