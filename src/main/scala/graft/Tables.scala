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
    *    TIMESTAMP_NTZ; the NTZ wall clock IS the UTC instant, and the
    *    cast to TimestampType interprets the wall clock in the SESSION
    *    time zone — so the self-healing block below pins the session
    *    zone to UTC alongside nanosAsLong. Without the pin, a foreign
    *    session (the documented spark-submit smoke-check case) in a
    *    non-UTC zone would silently read shifted instants. Side effect,
    *    deliberate and documented: a caller-owned session that reads
    *    events has its session time zone set to UTC from then on —
    *    every operator in this library already assumes UTC rendering
    *    ([[Sessions]] pins it), so a mixed-zone caller was never
    *    supported.
    *
    * Any other physical ts type (a future regen producing INT96 or
    * string) fails fast with the observed type instead of flowing
    * wrong-typed values downstream.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // self-healing: callers with their own session (the driver's smoke
    // check) would otherwise hit PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
    // or, in a non-UTC zone, a shifted NTZ→instant conversion
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(
          expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // session zone is pinned UTC above, so this cast maps the NTZ
        // wall clock to the identical instant
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
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
