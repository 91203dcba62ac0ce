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

  /** java.util.regex's `\b` word class — NOT `\w`: even without
    * UNICODE_CHARACTER_CLASS, Java's boundary node tests
    * `Character.isLetterOrDigit(cp) || cp == '_'` over CODEPOINTS, so
    * `é`, `是` or `𝒜` glue to an adjacent ASCII stopword ("le是" is one
    * \b-word and `\b(le)\b` does NOT match it), while `\w` itself stays
    * ASCII. RE2 (DuckDB) uses ASCII boundaries instead; the corpus
    * oracles stay green because the two engines' formulations only
    * diverge on non-ASCII-letter-adjacent stopwords, which the corpus
    * lacks — but the kernels must mirror the JAVA shape they replace
    * (the fuzz spec in TextOpsSpec caught exactly this).
    */
  @inline def isJavaBoundaryWord(cp: Int): Boolean =
    cp == '_'.toInt || Character.isLetterOrDigit(cp)

  /** Visit every maximal Java-`\b`-word codepoint run of `s` as
    * [start, end) char offsets via `onRun` — the only spans a
    * `\b(w1|w2|…)\b` alternation can match under java.util.regex.
    */
  @inline def scanJavaWordRuns(s: String)(onRun: (Int, Int) => Unit): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isJavaBoundaryWord(cp)) {
        var j = i + Character.charCount(cp)
        var done = false
        while (j < n && !done) {
          val c2 = s.codePointAt(j)
          if (isJavaBoundaryWord(c2)) j += Character.charCount(c2) else done = true
        }
        onRun(i, j)
        i = j
      } else {
        i += Character.charCount(cp)
      }
    }
  }
}
