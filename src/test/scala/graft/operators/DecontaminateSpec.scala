package graft.operators

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for eval-set decontamination: planted-containment semantics
  * (a training doc embedding an eval doc is flagged; disjoint text is
  * not), the clean() anti-join composition, a scalar replay on the real
  * corpus, and the broadcast-join scale shape.
  */
class DecontaminateSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"

  private def shingleSet(text: String): Set[String] = {
    val words = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").toSeq
    if (words.size < 3) Set.empty
    else words.sliding(3).map(_.mkString(" ")).toSet
  }

  test("planted containment: embedding flagged, disjoint not; clean drops flagged") {
    import spark.implicits._
    val evalDocs = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains ALL eval shingles (containment 1.0)
      (1L, "intro words alpha beta gamma delta epsilon and a long tail of more text"),
      // shares nothing
      (2L, "completely different content nothing shared here at all"),
      // shares 1 of the eval doc's 3 shingles (containment 1/3 < 0.5)
      (3L, "alpha beta gamma but then it diverges"),
      // REPEATS every eval shingle twice: containment is set
      // intersection over eval size and must stay exactly 1.0 — an
      // occurrence-counting bug (the map-side shingles_distinct dedupe
      // failing) would report 2.0 here
      (4L, "alpha beta gamma delta epsilon then alpha beta gamma delta epsilon again")
    ).toDF("doc_id", "text")
    val flagged = Decontaminate.flagged(corpus, evalDocs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(flagged.toSeq == Seq((1L, 100L, 1.0), (4L, 100L, 1.0)), s"got ${flagged.toSeq}")
    val kept = Decontaminate.clean(corpus, evalDocs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("flagged pairs equal the scalar replay on the real corpus") {
    val docs = Tables.documents(spark, sfDir)
    val all = docs.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), shingleSet(r.getString(1))))
    val ev = all.filter(_._1 % 7 == 0)
    val co = all.filter(_._1 % 7 != 0)
    val expected = (for {
      (cid, cs) <- co
      (eid, es) <- ev
      if es.nonEmpty
      c = (cs & es).size
      containment = c.toDouble / es.size
      if containment >= 0.5
    } yield (cid, eid, containment)).toSet
    val got = Decontaminate.flagged(
      docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"missed: ${(expected -- got).take(3)}, extra: ${(got -- expected).take(3)}")
    assert(got.nonEmpty, "eval set should intersect planted near-dups")
  }

  test("scale shape: one scan wave — no join, no exchange, probe in the generator") {
    // r14 kernel shape: the broadcast eval index is probed per document
    // INSIDE the scan, so the corpus-side plan is a single map stage
    // whose only rows are the flagged output — the r13 broadcast-join
    // shape still shuffled every (train, eval) pair for its groupBy
    // (365 MB at sf10, ~quadratic under proportional scaling)
    val docs = Tables.documents(spark, sfDir)
    val plan = Decontaminate.flagged(
      docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0), 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("eval_containment"), s"expected the probe generator:\n$plan")
    assert(!plan.contains("Join"), s"corpus side must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"corpus side must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("aggregate"), s"no aggregate remains:\n$plan")
  }

  test("random dense corpora: flagged pairs equal a scalar containment replica") {
    // Seeded randomized gate for the r12 partial-count rewrite: tiny
    // vocabularies force heavy shingle overlap AND in-document shingle
    // repeats (the exact shape whose double-counting the map-side set
    // semantics must absorb), random containment floors sweep the
    // threshold comparison, and both value AND membership must match
    // the independent scalar replica exactly — containment is the same
    // c/n_eval double division on both sides.
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 5) {
      val vocab = 3 + rnd.nextInt(4)
      val corpus = (1L to (10 + rnd.nextInt(15)).toLong).map { id =>
        id -> (0 until rnd.nextInt(20)).map(_ => s"t${rnd.nextInt(vocab)}").mkString(" ")
      }
      val evalDocs = (100L to (100 + rnd.nextInt(5)).toLong).map { id =>
        id -> (0 until rnd.nextInt(12)).map(_ => s"t${rnd.nextInt(vocab)}").mkString(" ")
      }
      val t = Seq(0.2, 0.5, 0.8, 1.0)(rnd.nextInt(4))
      val got = Decontaminate.flagged(
          corpus.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"), t)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val expected = (for {
        (cid, ctext) <- corpus
        (eid, etext) <- evalDocs
        cs = shingleSet(ctext); es = shingleSet(etext)
        if es.nonEmpty
        c = (cs & es).size
        if c > 0
        cont = c.toDouble / es.size.toDouble
        if cont >= t
      } yield ((cid, eid), cont)).toMap
      assert(got == expected,
        s"round=$round vocab=$vocab t=$t missed: ${(expected.keySet -- got.keySet).take(5)} " +
          s"extra: ${(got.keySet -- expected.keySet).take(5)} " +
          s"valueDiff: ${expected.filter { case (k, v) => got.get(k).exists(_ != v) }.take(3)}")
    }
  }
}
