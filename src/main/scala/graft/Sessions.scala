package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction so Verify / Bench / tests agree on the
  * configs that change semantics:
  *  - UTC session time zone,
  *  - shuffle partitions sized to local cores (AQE coalesces on a real
  *    cluster; 200 default partitions would just fragment local runs),
  *  - nanosAsLong so parquet TIMESTAMP(NANOS) columns (events.ts) are
  *    readable (Spark has no nanos timestamp type),
  *  - AQE on, matching what a production cluster would run.
  */
object Sessions {
  /** Default core count: all of the machine up to the 32 the target
    * environment provides (SPARK_GRAFT_CPUS overrides). Tests pass an
    * explicit small count; Bench/Verify get the full machine.
    */
  private def defaultCores: String =
    math.min(32, Runtime.getRuntime.availableProcessors()).toString

  /** Drop every CacheManager entry AND every persisted RDD's blocks,
    * blocking until the frees complete. The one cache-hygiene primitive
    * the harnesses share (Bench between/before timed runs, Verify
    * between queries, QueryProfile between profiled runs): operators
    * may persist() internal frames they cannot safely unpersist
    * themselves (e.g. the ngram prefix phase's ranked/perDoc frames,
    * whose consumers run at the CALLER's action time — see the
    * [[graft.operators.Dedup.prefixPairPhase]] ownership note), so a
    * session that runs many such queries calls this between them; a
    * missed site silently turns timed runs into cached-view reads
    * (r13 measured ngram at 5.8 s vs its honest ~12 s at sf10 that
    * way) or lets one query read its predecessor's cache.
    * clearCache() drops the CacheManager ENTRIES (so identical later
    * subplans re-execute), the RDD sweep frees checkpoint/persist
    * blocks the CacheManager does not own.
    */
  def dropAllCaches(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCores)): SparkSession = {
    // custom plan nodes (LocalSortHint) self-register their strategy on
    // whatever session their dataframe carries — no extension injection
    // here, so foreign/spark-submit sessions work identically
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // maxPartitionBytes stays at the 128 MB default: r9 tried a
      // session-global 8m to spread CPU-heavy multimodal scans across
      // cores, but the A/B showed it taxed the whole suite (~+24 %
      // total, q_dedup_groups 1.5x) while Multimodal.cpuSpread already
      // covers the one path that needs it — and 8 MB splits are the
      // wrong 100 TB default anyway (~13 M scan partitions of driver
      // scheduling and tiny-row-group reads).
      // bucketed tables must ALWAYS read one-task-per-bucket: the
      // planner's auto-disable (when it sees no join/agg benefit) falls
      // back to size-based file splitting, which at scale can split one
      // bucket across tasks — silently breaking the co-location the
      // zero-exchange engine path (MtmEngine colocated=true) relies on
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
