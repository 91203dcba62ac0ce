package graft.operators

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the decode/resize/frame-sample stages' REAL
  * parts — schema, determinism, magic preservation, bounded fan-out and
  * bounded output size — asserted over the synthetic payload column.
  * (The pixel math is a documented stub; nothing here depends on it
  * beyond determinism.)
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private lazy val payloads =
    Multimodal.withPayload(Tables.documents(spark, "/root/testdata/sf0.001"))
      .localCheckpoint()

  test("decodeMeta: deterministic, kind matches the magic, batches bounded") {
    val a = Multimodal.decodeMeta(payloads, batchSize = 64).collect()
    val b = Multimodal.decodeMeta(payloads, batchSize = 7).collect()
    assert(a.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSet ==
      b.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSet,
      "decode result must not depend on batch size")
    assert(a.forall(_.getInt(5) <= 64) && b.forall(_.getInt(5) <= 7), "batch cap violated")
    a.foreach { r =>
      val expected = r.getLong(0) % 3 match { case 0 => "png"; case 1 => "jpeg"; case _ => "riff" }
      assert(r.getString(1) == expected, s"doc ${r.getLong(0)} kind ${r.getString(1)}")
    }
  }

  test("resize: magic preserved, output size bounded by target dims, deterministic") {
    val out = Multimodal.resize(payloads, width = 64, height = 64).collect()
    assert(out.nonEmpty)
    val cap = 4 + math.max(16, 64 * 64 / 64)
    out.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(bytes.length <= cap, s"resized payload ${bytes.length} exceeds bound $cap")
      val expected = r.getLong(0) % 3 match { case 0 => "png"; case 1 => "jpeg"; case _ => "riff" }
      assert(r.getString(1) == expected)
    }
    val again = Multimodal.resize(payloads, width = 64, height = 64).collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload").toSeq)).toSet ==
      again.map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload").toSeq)).toSet)
  }

  test("featureExtract: real L1-normalized histograms that compose into the ANN operator") {
    val feats = Multimodal.featureExtract(payloads)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length == 256)
      assert(math.abs(v.sum - 1.0f) < 1e-3, s"doc ${r.getLong(0)} histogram sums to ${v.sum}")
    }
    // multimodal → similarity composition: identical payloads are each
    // other's nearest neighbors at cosine ~1 through the real ANN path
    val twin = payloads.limit(1).select(
      (col("doc_id") + 1000000L).as("doc_id"), col("payload"))
    val emb = Multimodal.featureExtract(payloads.limit(1).union(twin))
    val top = Similarity.annBruteForceTopK(emb, k = 1, nQueries = 2000000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(top.length == 2)
    top.foreach { case (q, n, cos) =>
      assert(math.abs(cos - 1.0) < 1e-6, s"twin of $q should be cosine~1, got $cos (nbr $n)")
    }
  }

  test("featureSummary: integer-exact count recovery from the float histogram") {
    // scalar replica: recompute (n, nnz, checksum) straight from the
    // payload bytes and demand equality with the recovered-count path —
    // the same identity the DuckDB oracle uses, so a drift here is a
    // CORRECTNESS red row, not a tolerance question
    val expected = payloads.collect().map { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]]("payload")
      val counts = new Array[Long](256)
      bytes.foreach(b => counts(b & 0xff) += 1L)
      id -> (bytes.length.toLong, counts.count(_ > 0).toLong,
        counts.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum)
    }.toMap
    val out = Multimodal.featureSummary(payloads).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (id, dim) = (r.getLong(0), r.getLong(1))
      assert(dim == 256L)
      val (n, nnz, csum) = expected(id)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((n, nnz, csum)),
        s"doc $id summary mismatch")
    }
  }

  test("frameSample: fan-out capped, non-video docs emit one frame, frames deterministic") {
    val frames = Multimodal.frameSample(payloads, everyMs = 5000L, maxFrames = 8)
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.nonEmpty)
    perDoc.foreach { case (id, n) =>
      assert(n >= 1 && n <= 8, s"doc $id fan-out $n outside [1, 8]")
      if (id % 3 != 2) assert(n == 1, s"non-riff doc $id should emit exactly one frame, got $n")
    }
    assert(perDoc.exists { case (id, n) => id % 3 == 2 && n > 1 },
      "some video should sample multiple frames")
    val again = Multimodal.frameSample(payloads, everyMs = 5000L, maxFrames = 8)
    assert(frames.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      again.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }
}
