package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language stopword hit counts of a document in ONE fused pass —
  * `array<long>` out, element i = language i's count.
  *
  * Replaces the 5 independent `regexp_extract_all(lower(text), pat)`
  * passes of the language-ID heuristic: each alternation regex re-scans
  * the whole text, so language-ID paid 1 lowercase + 5 regex automaton
  * runs per row. Here the text is lowercased once (the same
  * `UTF8String.toLowerCase` the `lower` function uses) and scanned once:
  * maximal Java-`\\b`-word runs (Unicode letterOrDigit/underscore — see
  * [[AsciiScan.isJavaBoundaryWord]] for why this is NOT `\\w`) are
  * hashed against the stopword table (a `\\b(w1|w2|…)\\b` alternation of
  * word-only alternatives can only ever match a complete maximal run,
  * so whole-run equality counts exactly what the regex counts), and
  * single-char entries (the hanzi particles, whose regex has no `\\b`)
  * are counted per occurrence anywhere. TextOpsSpec pins the fused
  * kernel equal to the regex formulation on the real corpus.
  *
  * @param wordGroups per-language whole-word stopwords (ASCII, lowercase)
  * @param charGroups per-language single-codepoint stopwords (BMP)
  */
case class LangStopHits(
    child: Expression,
    wordGroups: Seq[Seq[String]],
    charGroups: Seq[Seq[String]])
    extends UnaryExpression {

  require(wordGroups.length == charGroups.length, "one word + char group per language")
  require(charGroups.flatten.forall(_.length == 1), "char stopwords must be single BMP chars")

  private def nLangs: Int = wordGroups.length

  @transient private lazy val wordMap: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for ((ws, i) <- wordGroups.zipWithIndex; w <- ws)
      m.merge(w, Array(i), (a, b) => a ++ b)
    m
  }

  @transient private lazy val charMap: java.util.HashMap[java.lang.Integer, Array[Int]] = {
    val m = new java.util.HashMap[java.lang.Integer, Array[Int]]()
    for ((cs, i) <- charGroups.zipWithIndex; c <- cs)
      m.merge(Integer.valueOf(c.charAt(0).toInt), Array(i), (a, b) => a ++ b)
    m
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"lang_stop_hits requires a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LangStopHits.count(input.asInstanceOf[UTF8String], wordMap, charMap, nLangs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val words = ctx.addReferenceObj("lshWords", wordMap, "java.util.HashMap")
      val chars = ctx.addReferenceObj("lshChars", charMap, "java.util.HashMap")
      s"${ev.value} = graft.functions.LangStopHits.count($v, $words, $chars, $nLangs);"
    })

  override def toString: String = s"lang_stop_hits($child, nLangs=$nLangs)"

  override protected def withNewChildInternal(newChild: Expression): LangStopHits =
    copy(child = newChild)

  override def prettyName: String = "lang_stop_hits"
}

object LangStopHits {

  /** The single-pass scan — static so generated code calls it directly
    * (stays inside whole-stage codegen; the maps ride along as reference
    * objects, not literals).
    */
  def count(
      s: UTF8String,
      words: java.util.HashMap[String, Array[Int]],
      chars: java.util.HashMap[java.lang.Integer, Array[Int]],
      nLangs: Int): ArrayData = {
    val str = s.toLowerCase.toString
    val out = new Array[Long](nLangs)
    // word stopwords: whole Java-\b-word runs (see AsciiScan scaladoc —
    // the \b word class is Unicode letterOrDigit/underscore, so a run
    // containing any non-ASCII letter simply equals no ASCII stopword)
    AsciiScan.scanJavaWordRuns(str) { (i, j) =>
      val hit = words.get(str.substring(i, j))
      if (hit != null) {
        var k = 0
        while (k < hit.length) { out(hit(k)) += 1; k += 1 }
      }
    }
    // char stopwords (the hanzi particles): the regex has NO \b, so
    // every occurrence counts regardless of word context — including
    // inside a \b-word run (hanzi ARE Java letters)
    var i = 0
    val n = str.length
    while (i < n) {
      val hit = chars.get(Integer.valueOf(str.charAt(i).toInt))
      if (hit != null) {
        var k = 0
        while (k < hit.length) { out(hit(k)) += 1; k += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The kernel as a Column — direct construction, no session registry. */
  def hits(
      text: org.apache.spark.sql.Column,
      wordGroups: Seq[Seq[String]],
      charGroups: Seq[Seq[String]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(LangStopHits(ColumnBridge.expression(text), wordGroups, charGroups))
  }
}
