ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tradesignal_mtm_runnerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Emit the forked run's stdout raw (no "[info] " logger prefix): the
// driver parses Bench's one-line JSON out of the captured log tail, and
// the sbt prefix is the last plausible reason BENCH_r*.json reports
// parsed:null on an otherwise intact line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: at sf0.1 the 32-thread bench plus lazily-checkpointed
  // slice/index blocks fit an 8g heap but sit close enough to the GC
  // ceiling to add multi-second run-to-run variance on a 125g machine
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
// extra forked-JVM flags for measurement A/Bs (e.g. GC/JIT toggles
// while adjudicating the r19 excursion classes); never set by the
// driver, so the wired defaults above stay the contract
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split(' ').filter(_.nonEmpty))
