package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Scratch single-thread A/B for the MinHashDoc kernel's mh loop order
  * (host phases drift minute-to-minute, so cross-run Spark stage CPU
  * can't adjudicate a ~20% kernel delta — interleave the variants in
  * one JVM instead). Test/runMain graft.functions.MinHashKernelAB
  */
object MinHashKernelAB {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val words = Array.fill(5000)(rnd.alphanumeric.take(3 + rnd.nextInt(8)).mkString)
    val docs: Array[UTF8String] = Array.fill(2000) {
      val ntok = 200 + rnd.nextInt(800)
      UTF8String.fromString((0 until ntok).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val (as, bs) = MinHashSig.coeffs(128, 0x9e3779b97f4a7c15L)
    def run(): Long = {
      var acc = 0L
      var i = 0
      while (i < docs.length) {
        val r = MinHashDoc.compute(docs(i), 3, as, bs)
        acc += r.getArray(0).toLongArray()(0)
        i += 1
      }
      acc
    }
    var it = 0
    while (it < 8) {
      val t0 = System.nanoTime()
      val a = run()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ab] iter=$it t=$dt%.3f s acc=$a")
      it += 1
    }
  }
}
