package graft

/** Scratch diagnostic (not part of the library; deleted before commit). */
object DebugJoin {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Sessions.local()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[dbg] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // build bucketed copies up front (untimed)
    val bo = graft.sources.BucketedTables.orders(spark, dir)
    val bl = graft.sources.BucketedTables.lineitem(spark, dir)
    val coloc = operators.Analytics.orderRevenueByPriority(bo, bl)
    val shuf = operators.Analytics.orderRevenueByPriority(
      Tables.orders(spark, dir), Tables.lineitem(spark, dir))
    coloc.explain("formatted")
    (1 to 5).foreach { i =>
      time(s"coloc $i") { coloc.write.format("noop").mode("overwrite").save() }
      time(s"shuf  $i") { shuf.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
