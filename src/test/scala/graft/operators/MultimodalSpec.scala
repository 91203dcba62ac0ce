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
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("kind"), r.getAs[Int]("width"),
        r.getAs[Int]("height"), r.getAs[Int]("bit_depth"), r.getAs[Long]("duration_ms"))
    val a = Multimodal.decodeMeta(payloads, batchSize = 64).collect()
    val b = Multimodal.decodeMeta(payloads, batchSize = 7).collect()
    assert(a.map(key).toSet == b.map(key).toSet,
      "decode result must not depend on batch size")
    assert(a.forall(_.getAs[Int]("batch_size") <= 64) &&
      b.forall(_.getAs[Int]("batch_size") <= 7), "batch cap violated")
    a.foreach { r =>
      val expected = r.getAs[Long]("doc_id") % 3 match {
        case 0 => "png"; case 1 => "jpeg"; case _ => "riff"
      }
      assert(r.getAs[String]("kind") == expected, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Int]("bit_depth") == 0,
        "a 4-byte-magic synthetic payload must never take the real-parse path")
    }
  }

  test("decodeMeta: planted real PNG/BMP headers yield TRUE dimensions and bit depth") {
    import spark.implicits._
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    // minimal structurally valid PNG: signature, IHDR(len 13) with
    // 640x480 @ 8 bits/channel, then arbitrary tail bytes
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 6, 0, 0, 0) ++ Array.fill[Byte](8)(0x55)
    // BMP with BITMAPINFOHEADER: 13 x -7 (top-down) @ 24 bpp
    val bmp = "BM".getBytes("US-ASCII") ++ le32(54 + 13 * 7 * 3) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(13) ++ le32(-7) ++ Array[Byte](1, 0, 24, 0) ++ Array.fill[Byte](20)(0)
    // a PNG 4-byte magic withOUT the full signature must stay on the stub
    val fake = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte) ++ "hello".getBytes("UTF-8")
    val in = Seq((1L, png), (2L, bmp), (3L, fake)).toDF("doc_id", "payload")
    val got = Multimodal.decodeMeta(in).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("kind"), r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Int]("bit_depth")))
    }.toMap
    assert(got(1L) == (("png", 640, 480, 8)), s"png: ${got(1L)}")
    assert(got(2L) == (("bmp", 13, 7, 24)), s"bmp: ${got(2L)}")
    val (fk, fw, fh, fd) = got(3L)
    assert(fk == "png" && fd == 0 && fw >= 1 && fh >= 1,
      s"partial magic must fall through to the stub: ${got(3L)}")
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
