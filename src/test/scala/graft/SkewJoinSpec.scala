package graft

import graft.operators.{Analytics, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SkewJoin.salted: identical answers to the plain join, with a hot
  * key's fact volume actually spread across salted partitions.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  import spark.implicits._

  // planted skew: one user carries half the fact rows
  private lazy val facts = ((1 to 5000).map(i => (42L, s"hot_$i", i.toDouble)) ++
    (1 to 5000).map(i => (i.toLong % 997, s"cold_$i", i.toDouble)))
    .toDF("user_id", "tag", "value")
  private lazy val dim = (0L to 999L).map(u => (u, s"seg_${u % 7}")).toDF("user_id", "segment")

  test("salted join equals the plain join row-for-row") {
    val plain = facts.join(dim, Seq("user_id")).collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(facts, dim, Seq("user_id")).collect().map(_.toSeq).toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("the hot key's rows spread over multiple salt values") {
    val spreads = facts.filter(col("user_id") === 42L)
      .withColumn("__salt", pmod(xxhash64(facts.columns.map(col): _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(spreads >= 6, s"hot key should hash across ~8 salts, saw $spreads")
  }

  test("join key carries the salt (the shuffle spreads the hot key)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = SkewJoin.salted(facts, dim, Seq("user_id"))
        .queryExecution.executedPlan.toString
      assert(p.contains("__salt"), s"join must partition on the salted key:\n$p")
      assert(!p.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("wired rollup matches its unsalted twin on real events") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val salted = Analytics.saltedEventRollup(events).collect().map(_.toSeq).toSet
    val e = events.select(col("user_id"), col("event_type"), col("value"))
    val dimDf = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val plain = e.join(dimDf, Seq("user_id"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        graft.operators.ExactNum.sumExact(col("value") * col("n_events"), 1e6).as("weighted_value"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain && salted.nonEmpty)
  }
}
