package graft.functions

import graft.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** NtzAsUtcInstant: the zero-arithmetic NTZ→instant reinterpret behind
  * Tables.events' TIMESTAMP_NTZ path. The contract under test is
  * zone-purity: the produced instant equals the wall clock read as UTC
  * in EVERY session zone, and differs from the session-zone cast by
  * exactly the zone offset in a non-UTC session (proving the built-in
  * cast is the wrong tool, not an equivalent one).
  */
class NtzAsUtcInstantSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  test("reinterpret equals the UTC-session cast, in any session zone") {
    import spark.implicits._
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      val df = Seq("2024-01-15 12:34:56.789012", "1969-12-31 23:59:59.999999")
        .toDF("s")
        .select(col("s").cast(TimestampNTZType).as("ntz"))
        .localCheckpoint() // freeze values before the zone flips
      def instants(zone: String): Seq[Long] = {
        spark.conf.set("spark.sql.session.timeZone", zone)
        df.select(NtzAsUtcInstant.column(col("ntz")).as("t"))
          .collect().map(_.getTimestamp(0).getTime).toSeq
      }
      val utc = instants("UTC")
      assert(instants("Asia/Tokyo") == utc && instants("America/New_York") == utc,
        "the reinterpret must be independent of the session zone")
      // and the naive cast is NOT: in Tokyo it shifts by -9h (no DST)
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val cast = df.select(col("ntz").cast(TimestampType).as("t"))
        .collect().map(_.getTimestamp(0).getTime).toSeq
      assert(cast.zip(utc).forall { case (c, u) => c == u - 9L * 3600 * 1000 },
        "session cast should differ by the zone offset — else this spec tests nothing")
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("codegen and interpreted paths agree; null propagates; wrong type rejected") {
    import spark.implicits._
    val df = Seq(Some("2024-06-01 00:00:00"), None).toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ntz"))
    val out = df.select(NtzAsUtcInstant.column(col("ntz")).as("t")).collect()
    assert(out.length == 2 && out.count(_.isNullAt(0)) == 1)
    assert(df.select(NtzAsUtcInstant.column(col("ntz"))).schema.head.dataType == TimestampType)
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(NtzAsUtcInstant.column(col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("timestamp_ntz"))
  }
}
