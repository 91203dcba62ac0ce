package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Source-format breadth: the engine ingests CSV and JSON with explicit
  * schemas and round-trips the awkward payloads — documents (embedded
  * newlines/quotes/unicode) through CSV, embeddings (float arrays)
  * through JSON — bit-identically to the parquet read.
  */
class SourceFormatsSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")
  private val sfDir = "/root/testdata/sf0.001"

  test("events reader is zone-pure: same instants in a foreign non-UTC session, no conf mutation") {
    // the ADVICE r9 medium: a bare TIMESTAMP_NTZ -> TIMESTAMP cast reads
    // the wall clock in the SESSION zone, so a spark-submit session in
    // e.g. Asia/Tokyo silently shifted every instant by -9h. r10 fixed
    // this by pinning the session zone inside events() — which ADVICE
    // r10 flagged as its own hazard (the read permanently mutated the
    // caller's session). The r11 contract: the NtzAsUtcInstant
    // reinterpret — correct instants in ANY session zone, zone conf
    // untouched. (to_utc_timestamp(ntz, "UTC") was tried first and
    // FAILED this spec: it implicitly session-casts before shifting.)
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      val utc = Tables.events(spark, sfDir)
        .select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val foreign = Tables.events(spark, sfDir)
        .select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
      assert(utc.nonEmpty && foreign == utc,
        "a non-UTC caller session must read the same instants (pure NTZ conversion)")
      assert(spark.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo",
        "events() must NOT mutate the caller's session time zone")
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("documents round-trip through CSV (multiline text, quotes) bit-identically") {
    val docs = Tables.documents(spark, sfDir)
    val dir = Files.createTempDirectory("graft_csv").toString + "/docs"
    docs.write.option("header", "true").option("escape", "\"").csv(dir)
    val back = Tables.fromCsv(spark, dir, docs.schema)
    assert(back.schema == docs.schema)
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("embeddings round-trip through JSON (float arrays) bit-identically") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("graft_json").toString + "/emb"
    emb.write.json(dir)
    val back = Tables.fromJson(spark, dir, emb.schema)
    assert(back.schema == emb.schema)
    val a = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSet
    assert(a.nonEmpty && a == b)
  }
}
