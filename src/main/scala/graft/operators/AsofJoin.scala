package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * `right.ts <= left.ts` in the same key group (the time-series join —
  * bars to the prevailing quote, trades to the last signal).
  *
  * Spark has no asof operator, and the naive formulations die at scale:
  * an inequality join is a per-key cartesian the optimizer can't prune,
  * and a range probe per left row is driver-side. This is the
  * scale-correct shape — tag both sides, union, ONE hash shuffle on the
  * key, and a per-key time-ordered window where `last(right_payload,
  * ignoreNulls)` carries the prevailing right row forward onto each left
  * row. No join node at all: cost is the same single shuffle + sort a
  * sessionization pays, for any left/right size ratio, and a mega-key
  * degrades to one task's sort rather than a blowup.
  *
  * Contract: `right` must be unique per (key, ts) — at equal ts the
  * window order puts the right row first (ties INCLUDE equality, like
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`), but two right rows on the
  * same (key, ts) would make "the" prevailing row order-dependent.
  * Callers dedup first (`max_by` per (key, ts), see the q_asof_join
  * wiring); left duplicates are fine (each gets the same match).
  *
  * NULL keys follow SQL equality, not window-partition grouping: a
  * NULL never equals anything, so NULL-key right rows are filtered out
  * before the union (they could match no left row) and NULL-key left
  * rows come back with NULL right columns — the same answer DuckDB's
  * ASOF LEFT JOIN gives, where partitionBy alone would have matched
  * the two NULL groups to each other.
  *
  * Output: every left column, plus each right payload column (ts
  * included) as `rightPrefix + name` — NULL where no right row precedes
  * the left row (a LEFT asof join).
  */
object AsofJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightPrefix: String = "r_"): DataFrame = {
    val internal = Set("__ts", "__side", "__l", "__r", "__asof")
    require(!left.columns.exists(internal) && !right.columns.exists(internal),
      s"input columns collide with AsofJoin internals ${internal.mkString(", ")}")
    val rPayloadCols = tsCol +: right.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    val outNames = left.columns.toSeq ++ rPayloadCols.map(rightPrefix + _)
    require(outNames.distinct.size == outNames.size,
      s"output name collision (rightPrefix='$rightPrefix'): ${outNames.diff(outNames.distinct).mkString(", ")}")
    val lType = left.select(struct(left.columns.map(col): _*)).schema.head.dataType
    val rType = right.select(struct(rPayloadCols.map(col): _*)).schema.head.dataType

    val lU = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"),
        lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rU = right
      // NULL-key right rows can match no left row under SQL equality;
      // dropping them here (one codegen'd filter, no extra job) keeps
      // them out of the window's NULL partition, where they would
      // otherwise become "the prevailing row" for NULL-key left rows.
      // foldLeft(lit(true)), not reduce: an EMPTY keyCols is the legal
      // keyless global asof join, and empty.reduce throws
      .filter(keyCols.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          col(tsCol).as("__ts"),
          lit(0).as("__side"),
          lit(null).cast(lType).as("__l"),
          struct(rPayloadCols.map(col): _*).as("__r")): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lU.unionByName(rU)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
          rPayloadCols.map(c => col(s"__asof.$c").as(rightPrefix + c)): _*)
  }
}
