package graft

import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` for SparkEntry queries to files —
  * the committed plan evidence for optimization rounds (plans/r{N}/).
  * Queries whose operators drive jobs at construction (the README
  * "Eager construction" class) run those jobs here too; the dumped
  * plan is the final returned frame's, exactly what the bench's noop
  * sink executes.
  *
  * Test/runMain graft.PlanDump <outDir> <suffix> [sfDir] [only,csv]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("plans/r19")
    val suffix = args.lift(1).getOrElse("before")
    val sf = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val only = args.lift(3).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val spark = Sessions.local()
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(pats => pats.exists(name.contains)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sf)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable => System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        } finally Sessions.dropAllCaches(spark)
      }
    spark.stop()
  }
}
