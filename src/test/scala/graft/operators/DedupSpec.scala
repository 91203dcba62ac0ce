package graft.operators

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall/parity gates for the approximate dedup operators (SURVEY §2
  * #23/#24): MinHash-LSH must recover the exact n-gram Jaccard pairs at
  * the working threshold, and the SimHash chunk-join must equal the
  * brute-force Hamming-distance pairs (the 4×16 banding is lossless for
  * Hamming ≤ 3 by pigeonhole).
  */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_id_a", "doc_id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH recovers the exact jaccard>=0.8 pairs (recall 1.0 here)") {
    val docs = Tables.documents(spark, sfDir)
    val exact = pairSet(Dedup.ngramJaccardPairs(docs, threshold = 0.8))
    val lsh = pairSet(Dedup.minhashLshPairs(docs, threshold = 0.8))
    assert(exact.nonEmpty, "test corpus should contain planted near-dups")
    // post-verify precision is exact, so LSH ⊆ exact; near-dup pairs in
    // this corpus sit at j≈0.99 where 32-band/4-row miss prob < 1e-40
    assert(lsh == exact, s"missed: ${exact -- lsh}, extra: ${lsh -- exact}")
  }

  test("simhash chunk-join equals brute-force hamming<=3 pairs") {
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.simhashes(Dedup.shingleIndex(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, ha) <- sh
      (idb, hb) <- sh
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ida, idb)).toSet
    val got = Dedup.simhashPairs(docs, maxHamming = 3)
    val gotPairs = pairSet(got)
    assert(gotPairs == brute, s"missed: ${brute -- gotPairs}, extra: ${gotPairs -- brute}")
    assert(brute.nonEmpty, "planted near-dups should collide in simhash")
  }

  test("exact dedup groups are self-consistent") {
    val d = Dedup.exactDups(Tables.documents(spark, sfDir))
    assert(d.filter(col("group_size") < 1).count() == 0)
    assert(d.filter(col("is_canonical") && col("doc_id") =!= col("canonical_id")).count() == 0)
    // every group has exactly one canonical row
    val bad = d.groupBy("fp_md5")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"))
      .filter(col("n_canon") =!= 1)
    assert(bad.count() == 0)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val e = Dedup.embeddingNearDupsExact(Tables.embeddings(spark, sfDir), threshold = 0.4)
    val rows = e.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.4))
  }
}
