package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke contract: SparkEntry.entry(spark) must return
  * rows even when the session lacks graft.Sessions' configs (notably
  * parquet nanosAsLong, which events.ts requires and Tables.events must
  * self-heal).
  */
class EntrySmokeSpec extends AnyFunSuite {

  test("entry() works on a session without the nanosAsLong config") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // simulate the driver's bare session deterministically: drop the
    // config regardless of which suite created the JVM-wide session
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try {
      val df = SparkEntry.entry(spark)
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
  }
}
