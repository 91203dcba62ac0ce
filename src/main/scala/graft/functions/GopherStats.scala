package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-document counts behind the Gopher-rules quality filter
  * (SURVEY #51) in ONE fused pass —
  * `struct<n_words, n_word_chars, n_alpha_words, n_lines,
  * n_bullet_lines, n_ellipsis_lines, n_symbols, n_stop_distinct>` out.
  *
  * Replaces eight-plus regex/split passes per row (the oracle's literal
  * formulation). Regex-equivalence rules, pinned by GopherStatsSpec
  * against the Spark-regex twin:
  *
  *  - words are maximal `\S+` runs (`\s` = Java's ASCII class via
  *    [[AsciiScan.isSpace]]); `n_word_chars` counts their CODEPOINTS
  *    (what `length(regexp_replace(text,'\s+',''))` measures — both
  *    engines' `length` is codepoints); a word is alphabetic when it
  *    contains an ASCII letter (`[A-Za-z]`).
  *  - lines are `split(text, '\n', -1)` pieces (trailing empty piece
  *    kept — `n_lines` = count('\n') + 1, matching DuckDB
  *    `string_split`). A bullet line matches `^[ \t]*[-*•]`; an
  *    ellipsis line matches `(\.\.\.|…)[ \t]*$` — i.e. after stripping
  *    trailing spaces/tabs it ends in three ASCII dots or U+2026.
  *    `\r` of a CRLF ending is NOT in `[ \t]`, so CRLF lines never
  *    count as ellipsis lines — note this is RE2's bare-`$` semantics
  *    (end of input only), which the oracle runs; java.util.regex's
  *    bare `$` would ALSO match before that final `\r`, so the Java
  *    twin formulations must spell the anchor `\z`.
  *  - `n_symbols` counts '#' chars, '…' chars, and NON-OVERLAPPING
  *    `\.\.\.` matches (a run of d dots contributes d/3, the greedy
  *    left-to-right count `regexp_extract_all` produces).
  *  - `n_stop_distinct` counts how many DISTINCT members of the
  *    8-word Gopher stop list occur as maximal Java-`\b`-word runs of
  *    the lowered text (same boundary class as the other kernels —
  *    see [[AsciiScan.isJavaBoundaryWord]]).
  *
  * Reference for the rule family: Rae et al. 2021 (Gopher), appendix
  * A1.1 — word-count bounds, mean word length, symbol-to-word ratio,
  * bullet/ellipsis line ratios, alphabetic-word ratio, stopword
  * presence. The reference repo has no quality-filter surface
  * (tradesignal_mtm_runner is an MTM library); engine-native design.
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_word_chars", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet_lines", LongType, nullable = false),
    StructField("n_ellipsis_lines", LongType, nullable = false),
    StructField("n_symbols", LongType, nullable = false),
    StructField("n_stop_distinct", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"gopher_stats requires a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    GopherStats.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.GopherStats.count($v);")

  override def toString: String = s"gopher_stats($child)"

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)

  override def prettyName: String = "gopher_stats"
}

object GopherStats {

  /** Gopher's stopword-presence list (Rae et al. 2021 A1.1): a doc must
    * contain at least `minStopDistinct` DISTINCT members.
    */
  val StopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The fused scans — static so generated code calls it directly. */
  def count(s: UTF8String): InternalRow = {
    val raw = s.toString
    val n = raw.length
    var nWords = 0L
    var nWordChars = 0L
    var nAlphaWords = 0L
    var nLines = 1L
    var nBullet = 0L
    var nEllipsis = 0L
    var nSym = 0L

    var i = 0
    var lineStart = 0        // char index where the current line begins
    var blanksOnly = true    // only ' '/'\t' seen since line start
    var lastNonBlank = -1    // index of the line's last char outside [ \t]
    var inWord = false
    var wordHasAlpha = false
    var dotRun = 0

    // `(\.\.\.|…)[ \t]*$` on the current line, given its last non-blank char
    def endLine(): Unit = if (lastNonBlank >= 0) {
      val c = raw.charAt(lastNonBlank)
      if (c == '…') nEllipsis += 1
      else if (c == '.' && lastNonBlank - 2 >= lineStart &&
        raw.charAt(lastNonBlank - 1) == '.' && raw.charAt(lastNonBlank - 2) == '.') nEllipsis += 1
    }

    while (i < n) {
      val c = raw.charAt(i)
      if (c == '.') dotRun += 1 else { nSym += dotRun / 3; dotRun = 0 }
      if (c == '#' || c == '…') nSym += 1
      if (c == '\n') {
        endLine()
        nLines += 1
        lineStart = i + 1
        blanksOnly = true
        lastNonBlank = -1
        inWord = false
      } else {
        if (blanksOnly && c != ' ' && c != '\t') {
          if (c == '-' || c == '*' || c == '•') nBullet += 1
          blanksOnly = false
        }
        if (c != ' ' && c != '\t') lastNonBlank = i
        if (AsciiScan.isSpace(c)) inWord = false
        else {
          if (!inWord) { nWords += 1; inWord = true; wordHasAlpha = false }
          // count codepoints, not UTF-16 units (both engines' `length`)
          if (!(Character.isLowSurrogate(c) && i > 0 && Character.isHighSurrogate(raw.charAt(i - 1))))
            nWordChars += 1
          if (!wordHasAlpha && AsciiScan.isLetter(c)) { wordHasAlpha = true; nAlphaWords += 1 }
        }
      }
      i += 1
    }
    nSym += dotRun / 3
    endLine()

    // distinct Gopher stopword hits over the lowered text's \b-word runs
    val low = s.toLowerCase.toString
    var stopMask = 0
    AsciiScan.scanJavaWordRuns(low) { (j, k) =>
      if (k - j <= 4) { // longest stopword is 4 chars
        val w = low.substring(j, k)
        var b = 0
        while (b < StopWords.length) {
          if (StopWords(b) == w) stopMask |= 1 << b
          b += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](
      nWords, nWordChars, nAlphaWords, nLines, nBullet, nEllipsis, nSym,
      java.lang.Integer.bitCount(stopMask).toLong))
  }

  /** The kernel as a Column — direct construction, no session registry. */
  def stats(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(GopherStats(ColumnBridge.expression(text)))
  }
}
