package graft

import graft.operators.{Analytics, AsofJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsofJoin semantics (latest right at-or-before, per key) and its
  * single-shuffle no-join-node plan shape.
  */
class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  import spark.implicits._

  private lazy val left = Seq(
    // (key, ts, tag)
    (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 20L, "l20b"), (1L, 5L, "l5"),
    (2L, 7L, "m7")
  ).toDF("k", "ts", "ltag")

  private lazy val right = Seq(
    (1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9")
  ).toDF("k", "ts", "rtag")

  private lazy val out =
    AsofJoin(left, right, Seq("k"), "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        Option(r.getString(4)).getOrElse("-")))
      .toSet

  test("picks the latest right row at-or-before each left row, per key") {
    assert(out.contains((1L, 10L, "l10", 10L, "r10")), "equal ts must match (>= semantics)")
    assert(out.contains((1L, 20L, "l20", 15L, "r15")), "latest preceding right row wins")
  }

  test("left rows with no preceding right row get nulls (left join)") {
    assert(out.contains((1L, 5L, "l5", -1L, "-")))
    assert(out.contains((2L, 7L, "m7", -1L, "-")), "right row AFTER the left ts must not match")
  }

  test("duplicate left rows each get the same match; row count is preserved") {
    assert(out.contains((1L, 20L, "l20b", 15L, "r15")))
    assert(out.size == 5)
  }

  test("NULL keys never match (SQL equality, not window-partition grouping)") {
    val l = Seq((Option(1L), 10L, "l"), (Option.empty[Long], 10L, "lnull"))
      .toDF("k", "ts", "ltag")
    val r = Seq((Option(1L), 5L, "r"), (Option.empty[Long], 5L, "rnull"))
      .toDF("k", "ts", "rtag")
    val got = AsofJoin(l, r, Seq("k"), "ts").collect()
      .map(x => (x.getString(2), Option(x.getString(4)).getOrElse("-"))).toSet
    // DuckDB ASOF LEFT JOIN: the NULL-key left row matches nothing —
    // in particular NOT the NULL-key right row sharing its partition
    assert(got == Set(("l", "r"), ("lnull", "-")))
  }

  test("empty keyCols is the keyless GLOBAL asof join (regression: empty.reduce)") {
    val got = AsofJoin(left.drop("k"), right.drop("k"), Seq.empty, "ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    // all right rows form one global timeline (ts 9, 10, 15)
    assert(got == Set(
      (10L, "l10", 10L), (20L, "l20", 15L), (20L, "l20b", 15L),
      (5L, "l5", -1L), (7L, "m7", -1L)))
  }

  test("plan: one hash shuffle, no join node") {
    val p = AsofJoin(left, right, Seq("k"), "ts").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"asof join must cost exactly one shuffle, saw $exchanges:\n$p")
    assert(!p.contains("Join"), s"asof join must not plan a join node:\n$p")
  }

  test("name collisions with internals or the right prefix fail loudly") {
    intercept[IllegalArgumentException] {
      AsofJoin(left.withColumnRenamed("ltag", "__side"), right, Seq("k"), "ts")
    }
    intercept[IllegalArgumentException] {
      // left already owns r_ts — silent duplicate output names forbidden
      AsofJoin(left.withColumnRenamed("ltag", "r_ts"), right, Seq("k"), "ts")
    }
  }

  // getTime is millis; keep the sub-ms micros the events table carries
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  test("matches a per-key scalar replay on the events table") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val got = Analytics.asofPurchaseClicks(events)
    // independent scalar replay: sort each user's clicks, binary-search
    // the prevailing one per purchase
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("event_id"), max_by(col("value"), col("event_id")).as("value"))
      .select("user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), (micros(r.getTimestamp(1)), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val expected = events.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value").collect()
      .map { r =>
        val (u, tsUs) = (r.getLong(0), micros(r.getTimestamp(1)))
        val prevailing = clicks.getOrElse(u, Array.empty[(Long, Long, Double)])
          .takeWhile(_._1 <= tsUs).lastOption
        (u, tsUs, r.getLong(2), r.getDouble(3),
          prevailing.map(_._1).getOrElse(-1L), prevailing.map(_._2).getOrElse(-1L))
      }.toSet
    val gotSet = got.collect().map { r =>
      (r.getLong(0), micros(r.getTimestamp(1)), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) -1L else micros(r.getTimestamp(4)),
        if (r.isNullAt(5)) -1L else r.getLong(5))
    }.toSet
    assert(gotSet == expected)
    assert(gotSet.nonEmpty)
  }
}
