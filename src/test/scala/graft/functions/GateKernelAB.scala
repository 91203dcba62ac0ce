package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Scratch single-thread probe apportioning the corpus-clean scan
  * stage's CPU across its per-row kernels on REAL document text
  * (sf0.1, collected once). Host phases drift minute-to-minute, so the
  * variants interleave per iteration in one JVM — same protocol as
  * MinHashKernelAB. Test/runMain graft.GateKernelAB [sfDir]
  */
object GateKernelAB {
  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    val texts: Array[UTF8String] = graft.Tables.documents(spark, sf)
      .select("text").collect().map(r => UTF8String.fromString(r.getString(0)))
    println(s"[gk] docs=${texts.length} chars=${texts.map(_.numChars().toLong).sum}")
    val stops = {
      val s = new java.util.HashSet[String]()
      Seq("the", "a", "and", "of", "to", "is", "in", "that", "it", "on").foreach(s.add)
      s
    }
    val (as, bs) = MinHashSig.coeffs(128, 0x9e3779b97f4a7c15L)
    val wsPat = java.util.regex.Pattern.compile("\\s+")

    def time(name: String)(f: UTF8String => Long): Unit = {
      var acc = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < texts.length) { acc += f(texts(i)); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gk] $name%-22s $dt%7.3f s acc=$acc")
    }

    var it = 0
    while (it < 5) {
      println(s"[gk] --- iter $it ---")
      time("pii_redact")(s => PiiRedact.redact(s).getLong(1))
      time("gopher_stats")(s => GopherStats.count(s).getLong(0))
      time("text_stats")(s => TextStats.count(s, stops).getLong(0))
      // what Spark's trim(regexp_replace(lower(text),'\s+',' ')) pays
      time("normalize_regex") { s =>
        val m = wsPat.matcher(s.toLowerCase.toString)
        m.replaceAll(" ").trim.length.toLong
      }
      time("minhash_doc")(s => MinHashDoc.compute(s, 3, as, bs).getArray(1).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements().toLong)
      it += 1
    }
    spark.stop()
  }
}
