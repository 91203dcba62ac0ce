package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates the r17 session partitioning posture (the measured decision in
  * Sessions' initialPartitionNum note): the AQE initial shuffle count
  * stays at cores locally (10x cores priced a consistent fixed tax on
  * every sub-second shuffly query while the one measured large-SF
  * spill site is data-sized by its owning operator), the env override
  * exists for cluster-posture probes, and cached-plan re-planning
  * stays off so consumers can ride cache partitioning (flipped on, CC's
  * round join re-exchanged the edge cache every round). AQE coalescing
  * itself must stay active — without it every small shuffle runs the
  * full initial count of tasks.
  */
class SessionsSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  // the suite must stay green in an environment that exports the
  // deployment override (SPARK_GRAFT_INITIAL_PARTITIONS): Sessions.local
  // reads it unconditionally BY DESIGN, so the expected initial count
  // is the resolved value, not the literal cores (r17 ADVICE)
  private lazy val expectedInitial = Sessions.initialPartitions("4")

  test("initial shuffle count = cores locally; coalescing on; cache re-planning off") {
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum") === expectedInitial)
    // streaming state stores key off shuffle.partitions at first run
    // (AQE is not applied to stateful streaming shuffles)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true") === "true")
    // must stay at its false default: flipped on, a coalesced cache no
    // longer satisfies its consumers' co-partitioning and CC's round
    // join re-exchanges the edge CACHE every round (measured: 3
    // exchanges where the wired plan has 1). The persist-heavy
    // operators size their cached exchanges explicitly instead
    // (Dedup.indexShuffleParts / ConnectedComponents.buildEdges).
    assert(
      spark.conf.get(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false") === "false")
  }

  test("the deployment override resolves; the default is the cores value") {
    // env cannot be seeded for an in-process builder, so the
    // env-or-default resolution is a pure function gated directly —
    // a typo in the var name would otherwise silently ignore
    // deployment sizing while every session-conf assert stayed green
    assert(Sessions.initialPartitions("32", Map.empty) === "32")
    assert(Sessions.initialPartitions(
      "32", Map("SPARK_GRAFT_INITIAL_PARTITIONS" -> "4096")) === "4096")
  }

  test("scratch-dir resolution: env overrides win, tmpfs default, disk fallback") {
    // SPARK_LOCAL_DIRS wins inside Spark itself — setting the conf too
    // would only misreport the UI Environment tab, so resolution yields
    // nothing to set
    assert(Sessions.scratchDir(
      Map("SPARK_LOCAL_DIRS" -> "/mnt/nvme0"), shmWritable = true).isEmpty)
    // explicit deployment override, and its empty-string disable form
    assert(Sessions.scratchDir(
      Map("SPARK_GRAFT_LOCAL_DIR" -> "/mnt/fast"), shmWritable = true)
      === Some("/mnt/fast"))
    assert(Sessions.scratchDir(
      Map("SPARK_GRAFT_LOCAL_DIR" -> ""), shmWritable = true).isEmpty)
    // default: tmpfs when present AND big enough (the r19 shuffle-I/O
    // stall fix), JVM tmpdir otherwise — capacity pinned explicitly so
    // the assertion doesn't depend on this host's real /dev/shm
    assert(Sessions.scratchDir(Map.empty, shmWritable = true,
      shmUsableBytes = 126L << 30) === Some("/dev/shm/graft-spark-local"))
    assert(Sessions.scratchDir(Map.empty, shmWritable = false).isEmpty)
    // a writable-but-tiny /dev/shm (Docker's 64 MB default) must NOT be
    // picked: the first shuffle write past it dies with ENOSPC where
    // the JVM-tmpdir default worked (r19 review finding). Boundary: the
    // floor itself qualifies, one byte under does not.
    assert(Sessions.scratchDir(Map.empty, shmWritable = true,
      shmUsableBytes = 64L << 20).isEmpty)
    assert(Sessions.scratchDir(Map.empty, shmWritable = true,
      shmUsableBytes = Sessions.minShmUsableBytes)
      === Some("/dev/shm/graft-spark-local"))
    assert(Sessions.scratchDir(Map.empty, shmWritable = true,
      shmUsableBytes = Sessions.minShmUsableBytes - 1).isEmpty)
    // the explicit override is exempt from the capacity gate by design
    // (a deployment that KNOWS its tmpfs fits may point there)
    assert(Sessions.scratchDir(Map("SPARK_GRAFT_LOCAL_DIR" -> "/dev/shm/x"),
      shmWritable = true, shmUsableBytes = 0L) === Some("/dev/shm/x"))
  }

  test("the session announces its chosen shuffle scratch (r20)") {
    // the tmpfs default picks a capacity-at-the-margin risk; the line
    // names the choice and the override so an ENOSPC reader is one log
    // line from the fix. Both shapes gated; session build emits it.
    assert(Sessions.scratchLine(Some("/dev/shm/graft-spark-local"))
      === "[graft] shuffle scratch: /dev/shm/graft-spark-local " +
        "(override: SPARK_GRAFT_LOCAL_DIR=/tmp or SPARK_LOCAL_DIRS)")
    assert(Sessions.scratchLine(None).contains("Spark default"))
  }

  test("a small shuffle coalesces below the initial partition count") {
    import spark.implicits._
    val out = (1 to 1000).toDF("x")
      .groupBy(col("x") % 7).agg(sum("x"))
    out.write.format("noop").mode("overwrite").save()
    // post-AQE partition count: a ~KB shuffle must coalesce, proving
    // the coalescing machinery the posture leans on is actually active
    val parts = out.rdd.getNumPartitions
    // bound by the RESOLVED initial count (>= 2 so the bound is never
    // vacuous): with the deployment override exported the session
    // legitimately starts wider than cores, and a ~KB shuffle must
    // still coalesce below wherever it started
    val bound = math.max(2, expectedInitial.toInt)
    assert(parts >= 1 && parts < bound, s"post-AQE partitions = $parts (initial $expectedInitial)")
  }
}
