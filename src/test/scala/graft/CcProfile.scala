package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiler for star-contraction round shapes — run manually
  * with Test/runMain graft.CcProfile. Round 9 used it to REJECT the
  * "share one repartition(u) exchange between the min-aggregate and the
  * join" idea: Spark's exchange reuse does not fire across the
  * self-join's deduplicated relations (measured 5 exchanges vs 4 and
  * ~1.5× slower than the plain shape), which motivated the adopted
  * alternative — the asymmetric large-star that skips the symmetric
  * union entirely. Kept for re-measuring future round-shape ideas.
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val e = spark.range(200000).select(
      (col("id") % 50000 + 100000).as("u"), (col("id") % 17).as("v"))
      .distinct().localCheckpoint(eager = true)

    def report(name: String, df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      println(s"[prof] $name: exchanges=" + "Exchange".r.findAllIn(plan).size +
        " reused=" + plan.contains("ReusedExchange"))
    }

    // rejected shape: explicit repartition(u) hoping both consumers
    // reuse one physical shuffle (they don't — dedup'd relations)
    val eP = e.repartition(col("u"))
    val minsShared = eP.groupBy("u").agg(min(col("v")).as("m"))
    val shared = eP.join(minsShared, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(minsShared.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()

    // adopted small-star shape: the aggregate side arrives partitioned
    // from its own exchange; only the join's e side shuffles raw
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    val plain = e.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()

    report("shared(rejected)", shared)
    report("plain(adopted)", plain)

    def time(name: String)(df: => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val t = math.min(run(), run())
      println(f"[prof] $name%-20s $t%.3f s")
    }
    time("shared(rejected)")(shared)
    time("plain(adopted)")(plain)
    spark.stop()
  }
}
