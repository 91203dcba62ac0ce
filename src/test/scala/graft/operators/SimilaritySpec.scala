package graft.operators

import graft.{Sessions, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** ANN gates (SURVEY §2 #26/#27): the bounded-heap brute-force top-k
  * must equal a driver-side exact recomputation, and hyperplane-LSH must
  * reach a sane recall against it at the configured table/bit counts.
  */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.01"

  private def collectTopK(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Double)]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq }

  private lazy val vectors: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  private lazy val exactTopK: Map[Long, Seq[Long]] =
    (0L until 10L).map { q =>
      val qv = vectors(q)
      q -> vectors.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(10).map(_._1)
    }.toMap

  test("brute-force top-k equals driver-side exact recomputation") {
    val got = collectTopK(Similarity.annBruteForceTopK(Tables.embeddings(spark, sfDir)))
    assert(got.keySet == exactTopK.keySet)
    for ((q, neighbors) <- got) {
      assert(neighbors.map(_._1) == exactTopK(q), s"query $q neighbor mismatch")
      // heap scores equal direct cosine up to fp noise of summation order
      neighbors.foreach { case (id, c) =>
        assert(math.abs(c - cosine(vectors(q), vectors(id))) < 1e-12)
      }
    }
  }

  test("IVF top-k recall against brute force is reasonable") {
    val exact = exactTopK
    val ivf = collectTopK(Similarity.annIvfTopK(Tables.embeddings(spark, sfDir)))
      .map { case (q, ns) => q -> ns.map(_._1).toSet }
    val recalls = exact.map { case (q, ids) =>
      ids.count(ivf.getOrElse(q, Set.empty)).toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    info(s"IVF mean recall@10 = $mean")
    // measured 0.93 (sf0.01) / 0.92 (sf0.1) at the default 12-probe/16
    // cells (IvfSweep grid); 0.8 matches the LSH floor and still fails a
    // degraded quantizer or a broken sampled fit
    assert(mean >= 0.8, s"mean recall@10 $mean below 0.8 — IVF parameters degraded")
    // candidates carry exact cosines, so returned neighbors are real
    assert(ivf.values.forall(_.nonEmpty))
  }

  test("LSH top-k recall against brute force is reasonable") {
    val exact = exactTopK
    val lsh = collectTopK(Similarity.annLshTopK(Tables.embeddings(spark, sfDir)))
      .map { case (q, ns) => q -> ns.map(_._1).toSet }
    val recalls = exact.map { case (q, ids) =>
      val got = lsh.getOrElse(q, Set.empty)
      ids.count(got).toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    info(s"LSH mean recall@10 = $mean")
    // 0.4 would pass a nearly-useless index; the default 12 tables × 4
    // bits measures 0.89 on this corpus (candidates are deduped
    // pre-scoring, so extra tables cost buckets, not dot products)
    assert(mean >= 0.8, s"mean recall@10 $mean below 0.8 — LSH parameters degraded")
    // candidates are verified with exact cosine, so anything returned is real
    assert(lsh.values.forall(_.nonEmpty))
  }
}
