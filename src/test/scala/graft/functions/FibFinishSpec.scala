package graft.functions

import graft.Sessions
import org.scalatest.funsuite.AnyFunSuite

/** FibFinish parity: codegen'd expression vs the reference loop, and
  * the key-space contract (24-bit range, roughly centered mass — the
  * property stratified sampling's thresholds depend on).
  */
class FibFinishSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  test("codegen matches the reference implementation, keys in [0, 2^24)") {
    import spark.implicits._
    FibFinish.register(spark)
    val inputs = Seq(0L, 1L, -1L, 31L, Long.MaxValue, Long.MinValue, 123456789123456789L)
    val got = inputs.toDF("h").selectExpr("h", "fib_finish(h) AS k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (h <- inputs) {
      assert(got(h) == FibFinish.finish(h), s"mismatch at $h")
      assert(got(h) >= 0L && got(h) < (1L << 24), s"key out of range at $h: ${got(h)}")
    }
  }

  test("wrong arity raises an analysis error naming the function, not NoSuchElement") {
    FibFinish.register(spark)
    Mix64.register(spark)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT fib_finish()").collect()
    }
    assert(e1.getMessage.contains("fib_finish") && e1.getMessage.contains("1"),
      s"error must name the function and arity: ${e1.getMessage}")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mix64(1L, 2L)").collect()
    }
    assert(e2.getMessage.contains("mix64"), e2.getMessage)
  }

  test("sequential ids spread: keys of 10k consecutive ids fill the space evenly") {
    // the raw rolling hash of decimal strings strides in its LOW bits;
    // the finisher must spread that across the whole 24-bit space —
    // check all 16 top-level 1/16th buckets get within 2x of fair share
    val keys = (0L until 10000L).map(i =>
      FibFinish.finish(RollingHash.hashBytes(i.toString.getBytes("UTF-8"))))
    val byBucket = keys.groupBy(_ >> 20).view.mapValues(_.size).toMap
    assert(byBucket.size == 16, s"empty top buckets: ${byBucket.keySet}")
    for ((b, n) <- byBucket)
      assert(n > 10000 / 32 && n < 10000 / 8, s"bucket $b skewed: $n of 10000")
  }
}
