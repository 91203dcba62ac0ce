package graft.functions

import java.util.Locale

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The three byte-space text kernels normalize through
  * `String.toLowerCase(Locale.ROOT)` — this spec FORCES the JVM default
  * locale to tr_TR (the dotted-I trap: `"I".toLowerCase` is "ı" there)
  * around pure scalar kernel calls and asserts the ROOT mapping held.
  * An unpinned `toLowerCase` would silently diverge from SQL `lower`
  * (locale-independent `UTF8String.toLowerCase`) on any Turkish-locale
  * JVM and break oracle parity. Scalar-only inside the forced window
  * (no Spark jobs), default restored in finally.
  */
class LocalePinSpec extends AnyFunSuite {

  private val turkish = Locale.forLanguageTag("tr-TR")

  private def underTurkish[A](body: => A): A = {
    val saved = Locale.getDefault
    Locale.setDefault(turkish)
    try body finally Locale.setDefault(saved)
  }

  test("the trap is real: unpinned lowercase diverges under tr_TR") {
    assert("TITLE".toLowerCase(turkish) == "tıtle") // dotless ı
    assert("TITLE".toLowerCase(Locale.ROOT) == "title")
  }

  test("ShingleGenerator.tokenize is locale-pinned") {
    val toks = underTurkish { ShingleGenerator.tokenize("TITLE  IS\tFIT") }
    assert(toks.toSeq == Seq("title", "is", "fit"))
  }

  test("MinHashDoc.compute is locale-pinned") {
    val as = Array(0x9E3779B97F4A7C15L, 0xC2B2AE3D27D4EB4FL | 1L)
    val bs = Array(0x165667B19E3779F9L, 0x27D4EB2F165667C5L)
    val text = UTF8String.fromString("THIS IS IT EXACTLY FIT")
    def sig(): (Seq[Long], Seq[Long]) = {
      val row = MinHashDoc.compute(text, 3, as, bs)
      (row.getArray(0).toLongArray().toSeq, row.getArray(1).toLongArray().toSeq)
    }
    val pinned = sig()
    assert(underTurkish { sig() } == pinned)
  }

  test("EvalContainment.probe is locale-pinned") {
    val idx = EvalContainment.build(Array(("this is it", Array(7L))))
    val counts = new Array[Int](idx.evalIds.length)
    val touched = new Array[Int](idx.evalIds.length)
    val hits = underTurkish {
      EvalContainment.probe(
        UTF8String.fromString("THIS IS IT EXACTLY"), idx, 3, 0.5, counts, touched)
    }.iterator.toSeq
    assert(hits.map(r => (r.getLong(0), r.getDouble(1))) == Seq((7L, 1.0)))
    assert(counts.forall(_ == 0), "per-task scratch must leave counts zeroed")
  }

  test("pow2Cap: long arithmetic, load < 0.7, hard ceiling instead of a hang") {
    assert(MinHashDoc.pow2Cap(0, "t") == 8)
    assert(MinHashDoc.pow2Cap(5, "t") == 8)   // 8*7=56 > 50
    assert(MinHashDoc.pow2Cap(6, "t") == 16)  // 8*7=56 < 60
    // the Int-arithmetic overflow zone: cnt*10 wraps negative at ~215M
    // and the old loop returned 8 (then the insert loop spun forever)
    assert(MinHashDoc.pow2Cap(220_000_000, "t") == 1 << 29)
    assert(MinHashDoc.pow2Cap(((1 << 30) * 7L / 10).toInt, "t") == 1 << 30)
    val e = intercept[IllegalArgumentException] {
      MinHashDoc.pow2Cap(800_000_000, "overflow probe")
    }
    assert(e.getMessage.contains("overflow probe"))
  }
}
