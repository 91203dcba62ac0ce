package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** PII/pattern redaction (SURVEY #50) as ONE fused scan —
  * `struct<clean string, n_email, n_ip, n_phone bigint>` out.
  *
  * The patterns are exactly these three regexes, applied as three
  * SEQUENTIAL global replaces (email, then phone, then IPv4 — the
  * oracle's literal formulation, DuckDB `regexp_replace(..., 'g')`
  * three deep):
  *
  *   email: `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` → `<EMAIL>`
  *   phone: `\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}`               → `<PHONE>`
  *   ipv4:  `[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}` → `<IP>`
  *
  * The single left-to-right pass with per-position priority
  * email > phone > ip produces the SAME output as the three passes:
  * every phone/ip span consists solely of email local-part characters
  * (`[0-9.+-]` ⊂ `[A-Za-z0-9._%+-]`), so any email overlapping a
  * later-pass span has a match starting at or before the span start —
  * which the fused scan tries (email first) before the span can be
  * consumed; phone and ip matches start at disjoint characters ('+'
  * vs a digit) and an ip span never contains a '+', so the phone and
  * ip passes cannot interact; and the replacement tokens contain no
  * `@`, digit, or `+`, so later patterns cannot match across a token
  * boundary. The pass ORDER is load-bearing: with ip before phone, an
  * ip can start inside a phone's trailing digit group
  * ("+44-123-45675.6.7.8" — ip would steal "675.6.7.8") and no single
  * left-to-right scan reproduces that; phone-first both removes the
  * interaction and is the better redaction policy (a phone number is
  * more identifying than a dotted quad). Greedy
  * quantifier semantics are replicated structurally: maximal local
  * run, rightmost domain dot with ≥2 letters after it (what greedy
  * `[A-Za-z0-9.-]+` backtracks to), and descending-length quad/group
  * attempts for the numeric patterns (the backtracking visit order).
  * PiiRedactSpec pins all of this by fuzzing against java.util.regex's
  * three sequential `replaceAll`s.
  *
  * Scale shape: per-row, allocation-light (one output builder), fully
  * codegen'd, no regex-engine alternation restarts — the AsciiScan
  * family pattern. A 100 TB redaction pass is then scan-bound, and
  * the expression composes into CorpusPipeline without adding an
  * exchange.
  */
case class PiiRedact(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_email", LongType, nullable = false),
    StructField("n_ip", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pii_redact requires a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    PiiRedact.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.PiiRedact.redact($v);")

  override def toString: String = s"pii_redact($child)"

  override protected def withNewChildInternal(newChild: Expression): PiiRedact =
    copy(child = newChild)

  override def prettyName: String = "pii_redact"
}

object PiiRedact {
  import AsciiScan.{isDigit, isLetter}

  @inline private def isLocalChar(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def isDomainChar(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '-'

  /** Digits available from `i` (capped at `max`). */
  @inline private def digitRun(s: String, i: Int, max: Int): Int = {
    val n = s.length
    var j = i
    while (j < n && j - i < max && isDigit(s.charAt(j))) j += 1
    j - i
  }

  /** End index of an email match starting exactly at `start`, or the
    * NEGATED failure boundary: every start in `[start, -result)` fails
    * too, so the caller skips re-attempts across the rest of the local
    * run. Sound because a failure is decided entirely past the run —
    * all starts inside one maximal local run scan to the same run end
    * (`@` is not a local char, so the run contains none), and both the
    * missing-`@` and the failed-domain checks read only from that
    * shared end onward. A success, conversely, is only ever observed
    * at the first attempted start of its run (it consumes the rest).
    *
    * Structure of the greedy regex: maximal local run, literal `@`,
    * then the RIGHTMOST dot of the maximal domain run that has ≥2
    * letters after it (greedy `[A-Za-z0-9.-]+` backtracks from the
    * right); the match ends after the maximal letter run behind that
    * dot.
    */
  private def matchEmail(s: String, start: Int): Int = {
    val n = s.length
    var j = start + 1
    while (j < n && isLocalChar(s.charAt(j))) j += 1
    if (j >= n || s.charAt(j) != '@') return -j
    val at = j
    var k = at + 1
    while (k < n && isDomainChar(s.charAt(k))) k += 1
    var d = k - 1
    while (d > at + 1) { // pre-dot domain part must be non-empty
      if (s.charAt(d) == '.') {
        var a = d + 1
        while (a < k && isLetter(s.charAt(a))) a += 1
        if (a - d - 1 >= 2) return a
      }
      d -= 1
    }
    -at
  }

  /** End index of an IPv4 match starting exactly at `start`, or -1.
    * Descending-length attempts per octet replicate the backtracking
    * visit order of `[0-9]{1,3}\.` three times; the last octet is
    * plain greedy (nothing after it to satisfy).
    */
  private def matchIp(s: String, start: Int): Int = {
    val n = s.length
    var l1 = digitRun(s, start, 3)
    while (l1 >= 1) {
      val p2 = start + l1 + 1
      if (start + l1 < n && s.charAt(start + l1) == '.') {
        var l2 = digitRun(s, p2, 3)
        while (l2 >= 1) {
          val p3 = p2 + l2 + 1
          if (p2 + l2 < n && s.charAt(p2 + l2) == '.') {
            var l3 = digitRun(s, p3, 3)
            while (l3 >= 1) {
              val p4 = p3 + l3 + 1
              if (p3 + l3 < n && s.charAt(p3 + l3) == '.') {
                val l4 = digitRun(s, p4, 3)
                if (l4 >= 1) return p4 + l4
              }
              l3 -= 1
            }
          }
          l2 -= 1
        }
      }
      l1 -= 1
    }
    -1
  }

  /** End index of a phone match starting exactly at `start`, or -1. */
  private def matchPhone(s: String, start: Int): Int = {
    val n = s.length
    if (s.charAt(start) != '+') return -1
    var cc = digitRun(s, start + 1, 3)
    while (cc >= 1) {
      val pDash = start + 1 + cc
      if (pDash < n && s.charAt(pDash) == '-') {
        val p3 = pDash + 1
        // {3} exact: three digits then a literal '-' (a 4th digit kills it)
        if (digitRun(s, p3, 4) == 3 && p3 + 3 < n && s.charAt(p3 + 3) == '-') {
          val p4 = p3 + 4
          val l4 = digitRun(s, p4, 4)
          if (l4 >= 3) return p4 + l4
        }
      }
      cc -= 1
    }
    -1
  }

  private val EmailTok = "<EMAIL>"
  private val IpTok = "<IP>"
  private val PhoneTok = "<PHONE>"

  /** The fused scan — static so generated code calls it directly. */
  def redact(s: UTF8String): InternalRow = {
    val raw = s.toString
    val n = raw.length
    val sb = new java.lang.StringBuilder(n)
    var nEmail = 0L
    var nIp = 0L
    var nPhone = 0L
    var i = 0
    var emailFailUntil = 0 // starts below this index are known email non-matches
    while (i < n) {
      val c = raw.charAt(i)
      var e = -1
      if (isLocalChar(c)) { // every pattern starts with a local-class char
        // without the memo this is the kernel's only super-linear spot:
        // every char of a non-email word re-scanned the word's whole
        // tail (O(Σ run²) — a long URL/token paid its length squared)
        if (i >= emailFailUntil) {
          e = matchEmail(raw, i)
          if (e < 0) { emailFailUntil = -e; e = -1 }
        }
        if (e > 0) { sb.append(EmailTok); nEmail += 1 }
        else if (isDigit(c)) {
          e = matchIp(raw, i)
          if (e > 0) { sb.append(IpTok); nIp += 1 }
        } else if (c == '+') {
          e = matchPhone(raw, i)
          if (e > 0) { sb.append(PhoneTok); nPhone += 1 }
        }
      }
      if (e > 0) i = e
      else { sb.append(c); i += 1 }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), nEmail, nIp, nPhone))
  }

  /** Column wrapper, TextStats-style. */
  def redacted(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(PiiRedact(ColumnBridge.expression(text)))
  }
}
