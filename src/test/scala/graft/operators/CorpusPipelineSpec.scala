package graft.operators

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed cleaning pipeline must actually enforce each stage's
  * invariant on the real corpus: quality floor, canonical-only exact
  * groups, and no surviving near-dup pairs.
  */
class CorpusPipelineSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"

  test("cleaned corpus satisfies all three stage invariants") {
    val docs = Tables.documents(spark, sfDir)
    val clean = CorpusPipeline.cleanCorpus(docs, minQuality = 0.5, jaccardThreshold = 0.8)
    val kept = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < docs.count())
    // 1. every survivor clears the quality floor
    assert(clean.filter(col("quality_score") < 0.5).count() == 0)
    // 2. no two survivors share a near-dup pair at the threshold
    val pairs = Dedup.ngramJaccardPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"near-dup pair ($a,$b) both survived")
    }
    // 3. deterministic: rerunning yields the same set
    val again = CorpusPipeline.cleanCorpus(docs, 0.5, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }

  test("redactPii flag scrubs planted PII before the pipeline stages see it") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).limit(50)
      .select(col("doc_id"),
        concat(lit("mail me x.y@mail.example.com then "), col("text")).as("text"))
    val clean = CorpusPipeline.cleanCorpus(docs, minQuality = 0.0, redactPii = true)
    val rows = clean.select("text").as[String].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.contains("x.y@mail.example.com")), "planted email survived")
    assert(rows.forall(_.contains("<EMAIL>")), "placeholder token missing")
    // default stays redaction-free: the wired corpus oracles see raw text
    val raw = CorpusPipeline.cleanCorpus(docs, minQuality = 0.0)
      .select("text").as[String].collect()
    assert(raw.forall(_.contains("x.y@mail.example.com")))
  }

  test("stage report is monotonically non-increasing") {
    val report = CorpusPipeline.stageReport(Tables.documents(spark, sfDir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report("input") >= report("quality_gate"))
    assert(report("quality_gate") >= report("exact_dedup"))
    assert(report("exact_dedup") >= report("near_dedup"))
    assert(report("near_dedup") > 0)
  }
}
