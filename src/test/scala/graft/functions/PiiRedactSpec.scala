package graft.functions

import graft.Sessions
import org.scalatest.funsuite.AnyFunSuite

/** PiiRedact parity: the fused scanner must equal three SEQUENTIAL
  * java.util.regex global replaces (email → phone → ip, the declared
  * pass order) — the literal shape the DuckDB oracle replays. The
  * order matters: with ip BEFORE phone, an ip match can start inside
  * a phone's trailing digit group ("+44-123-45675.6.7.8" — ip steals
  * "675.6.7.8") and no single left-to-right pass can reproduce that;
  * with phone first the interaction vanishes (phone starts only at
  * '+', which ip spans never contain). The fuzz found exactly this.
  * Canonical plants pin the intended semantics; the seeded fuzz over
  * a pattern-dense alphabet pins the greedy/backtracking equivalence
  * structurally.
  */
class PiiRedactSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  private val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val Phone = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"

  private def regexRedact(s: String): (String, Long, Long, Long) = {
    val afterEmail = s.replaceAll(Email, "<EMAIL>")
    val afterPhone = afterEmail.replaceAll(Phone, "<PHONE>")
    val afterIp = afterPhone.replaceAll(Ip, "<IP>")
    def hits(in: String, p: String): Long =
      p.r.findAllMatchIn(in).size.toLong
    (afterIp, hits(s, Email), hits(afterPhone, Ip), hits(afterEmail, Phone))
  }

  private def kernel(s: String): (String, Long, Long, Long) = {
    val r = PiiRedact.redact(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("canonical plants: the three categories, near-misses untouched") {
    val cases = Seq(
      "reach me at jo.na+x@mail.example.com today" ->
        "reach me at <EMAIL> today",
      "host 10.0.0.255 and 192.168.1.1 up" -> "host <IP> and <IP> up",
      "call +1-555-0123 or +44-123-45678" -> "call <PHONE> or <PHONE>8",
      // near-misses: no TLD, two-part version number, short country run
      "a@b ver 1.2 x +1-55-0123 end" -> "a@b ver 1.2 x +1-55-0123 end",
      // email eats what could have been an ip (sequential email-first)
      "1.2.3.4@x.co rest 1.2.3.4" -> "<EMAIL> rest <IP>",
      "u@ab.cd2 u@ab.cde.9x u@.com" -> "<EMAIL>2 <EMAIL>.9x u@.com",
      "1234.5.6.7.8" -> "1<IP>.8",
      "" -> "")
    for ((in, want) <- cases) {
      assert(regexRedact(in)._1 == want, s"regex reference drifted on: $in")
      assert(kernel(in)._1 == want, s"kernel diverged on: $in")
    }
  }

  test("fuzz: kernel equals sequential java.util.regex replaces on 3000 dense strings") {
    val rnd = new scala.util.Random(20260813L)
    val frags = Seq(
      "a@b.co", "x.y@mail.example.com", "1.2.3.4", "10.0.0.255", "+1-555-0123",
      "+44-123-4567", "a@b", "user@.com", "1.2.3", "1234.5.6.7.8", "ver 1.2 ",
      "+1-55-0123", "u@ab.cd2", "u@ab.cde.9x", "@@", "..", "999.999.999.999.9",
      "+123-456-78901", "a@-.-xy", ".s@m.co.", "-@-.--ab-", "5.6.7.8.9.10",
      "%+_@z.ab", "+1-234-5.6.7.8")
    val alphabet = "abz019.@+-_% <>"
    var checked = 0
    for (_ <- 0 until 3000) {
      val s = (0 until (1 + rnd.nextInt(8))).map { _ =>
        if (rnd.nextBoolean()) frags(rnd.nextInt(frags.size))
        else (0 until (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.mkString
      val want = regexRedact(s)
      val got = kernel(s)
      assert(got == want, s"diverged on ${s.take(120)}: got $got want $want")
      checked += 1
    }
    assert(checked == 3000)
  }

  test("codegen path equals the interpreted kernel over a DataFrame") {
    import spark.implicits._
    val rows = Seq(
      "mail a.b@c.de and 1.2.3.4 and +1-555-0123",
      "none here", "x@y.zz", "+12-345-678").toDF("text")
    val got = rows.select(PiiRedact.redacted(org.apache.spark.sql.functions.col("text")).as("r"))
      .selectExpr("r.clean", "r.n_email", "r.n_ip", "r.n_phone")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = Seq(
      ("mail <EMAIL> and <IP> and <PHONE>", 1L, 1L, 1L),
      ("none here", 0L, 0L, 0L),
      ("<EMAIL>", 1L, 0L, 0L),
      ("<PHONE>", 0L, 0L, 1L))
    assert(got.toSeq == want)
  }
}
