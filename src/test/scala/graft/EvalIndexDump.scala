package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** r20 evidence helper: dump the CONSTRUCTION-side plan of
  * Decontaminate's eval shingle index (the collect that runs at
  * flagged() call time and never appears in the final query's explain).
  * Mirrors Decontaminate.flagged's call site (r20: spread = false).
  * Test/runMain graft.EvalIndexDump <outFile> [sfDir]
  */
object EvalIndexDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    val evalDocs = Tables.documents(spark, sf).filter(col("doc_id") % 7 === 0)
    val grouped = graft.operators.Dedup.shingleIndex(evalDocs, spread = false)
      .groupBy("shingle").agg(collect_list(col("doc_id").cast("long")).as("ids"))
    Files.writeString(Paths.get(out), grouped.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println(s"[evalindexdump] -> $out")
    spark.stop()
  }
}
