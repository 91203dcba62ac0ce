package graft.functions

/** The ASCII character classes and `\w`-run scanner shared by the fused
  * text kernels ([[LangStopHits]], [[TextStats]]) — the ONE definition
  * of the regex-equivalence rules their parity specs pin: `isWordChar`
  * is exactly java.util.regex `\w`, `isSpace` exactly `\s`, and
  * `scanWordRuns` visits exactly the maximal `\w` runs (the only spans
  * a `\b(w1|w2|…)\b` alternation of word-only alternatives can match)
  * plus every non-word char between them. A divergence between the two
  * kernels' boundary rules would break oracle parity in one wired query
  * but not the other — which is why the rules live here once.
  */
private[functions] object AsciiScan {

  // exactly java.util.regex \s (ASCII)
  @inline def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  // exactly java.util.regex \w
  @inline def isWordChar(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '_'

  /** Visit every maximal `\w` run of `s` as [start, end) via `onRun`,
    * and every char outside a run via `onOther`, left to right.
    */
  @inline def scanWordRuns(s: String)(onRun: (Int, Int) => Unit)(onOther: Char => Unit): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      if (isWordChar(s.charAt(i))) {
        var j = i + 1
        while (j < n && isWordChar(s.charAt(j))) j += 1
        onRun(i, j)
        i = j
      } else {
        onOther(s.charAt(i))
        i += 1
      }
    }
  }
}
