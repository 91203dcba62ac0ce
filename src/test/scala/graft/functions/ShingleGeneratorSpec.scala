package graft.functions

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native shingle generator must reproduce the SQL-side
  * normalization exactly (its output feeds DuckDB-oracled Jaccard
  * counts) and handle the degenerate inputs.
  */
class ShingleGeneratorSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  private def shinglesOf(text: String): Seq[String] = {
    import spark.implicits._
    ShingleGenerator.register(spark)
    Seq(Option(text)).toDF("text")
      .selectExpr("shingles(text) AS s")
      .collect().map(_.getString(0)).toSeq
  }

  test("basic sliding window") {
    assert(shinglesOf("a b c d") == Seq("a b c", "b c d"))
  }

  test("normalization: case, whitespace runs, leading/trailing space") {
    assert(shinglesOf("  A   b\tC  ") == Seq("a b c"))
    assert(shinglesOf("x\n y \n z w") == Seq("x y z", "y z w"))
  }

  test("degenerate inputs: short, empty, null") {
    assert(shinglesOf("a b") == Seq.empty)
    assert(shinglesOf("") == Seq.empty)
    assert(shinglesOf(null) == Seq.empty)
  }

  test("matches the SQL normalization on the real corpus") {
    ShingleGenerator.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.selectExpr("doc_id", "shingles(text) AS shingle")
      .groupBy("doc_id").agg(sort_array(collect_list("shingle")).as("gs"))
    // SQL-side equivalent: split normalized text, slide via sequence
    val tokens = split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")
    val sql = docs.select(
        col("doc_id"),
        explode(transform(sequence(lit(0), size(tokens) - 3), i =>
          concat_ws(" ",
            element_at(tokens, i + 1), element_at(tokens, i + 2), element_at(tokens, i + 3))))
          .as("shingle"))
      .groupBy("doc_id").agg(sort_array(collect_list("shingle")).as("gs"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val e = sql.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(n == e && n.nonEmpty)
  }
}
