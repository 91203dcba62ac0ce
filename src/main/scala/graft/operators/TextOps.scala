package graft.operators

import graft.functions.RollingHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY §2 #17-20):
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. Everything is a narrow per-row projection built from
  * `org.apache.spark.sql.functions._` (whole-stage codegen, no UDFs, no
  * shuffle); the scan prunes to (doc_id, text) so at 100 TB the cost is
  * the parquet column read + regex CPU, perfectly data-parallel.
  *
  * Every double expression mirrors its DuckDB oracle token-for-token
  * (driver compares bit-exact); regex patterns are restricted to the
  * RE2 ∩ java.util.regex common subset.
  */
object TextOps {

  /** Count of non-overlapping regex matches — same left-to-right scan in
    * Spark and DuckDB, so counts agree exactly.
    */
  private def nMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("bigint")

  /** SURVEY #17: whitespace tokens + BPE-ish subtokens (letter runs,
    * digit runs, individual symbol marks).
    */
  def tokenCount(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      nMatches(col("text"), "\\S+").as("n_ws_tokens"),
      nMatches(col("text"), "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]").as("n_subtokens"))

  private val EnStop = "\\b(the|a|and|of|to|is|in|that|it|on)\\b"

  private def punctRatioExpr(text: Column): Column = {
    val nChars = length(text).cast("bigint")
    when(nChars === 0, lit(0.0))
      .otherwise(nMatches(text, "[^A-Za-z0-9\\s]").cast("double") / nChars.cast("double"))
  }

  private def stopRatioExpr(text: Column): Column = {
    val nWs = nMatches(text, "\\S+")
    when(nWs === 0, lit(0.0))
      .otherwise(nMatches(lower(text), EnStop).cast("double") / nWs.cast("double"))
  }

  /** The quality score as a single column expression over raw text —
    * pipelines attach it with a projection instead of a join
    * (CorpusPipeline's stage 1 stays shuffle-free this way).
    */
  def qualityExpr(text: Column): Column = {
    val lenScore = least(lit(1.0), length(text).cast("bigint").cast("double") / lit(500.0))
    lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punctRatioExpr(text)) +
      lit(0.3) * least(lit(1.0), stopRatioExpr(text) * lit(5.0))
  }

  /** SURVEY #18: quality score from length, punctuation and stopword
    * ratios (the standard LLM-corpus heuristics family).
    */
  def qualityScore(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      punctRatioExpr(col("text")).as("punct_ratio"),
      stopRatioExpr(col("text")).as("stop_ratio"),
      qualityExpr(col("text")).as("quality_score"))

  /** Per-language stopword regexes (ASCII word-boundary; zh uses common
    * hanzi particles, which simply never hit on ASCII corpora).
    */
  private val LangStops: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|von|mit|den|ein|eine)\\b",
    "en" -> "\\b(the|a|and|of|to|is|in|that|it|on)\\b",
    "es" -> "\\b(el|la|de|que|y|en|un|una|los|las)\\b",
    "fr" -> "\\b(le|la|de|et|les|des|un|une|du|dans)\\b",
    "zh" -> "(的|是|不|了|在)")

  /** SURVEY #19: stopword-hit language heuristic. Argmax over per-language
    * hit counts, deterministic tie-break in lexicographic language order,
    * 'und' when nothing hits.
    */
  def langId(documents: DataFrame): DataFrame = {
    val lowered = lower(col("text"))
    val hits = LangStops.map { case (l, p) => l -> nMatches(lowered, p) }
    val mx = greatest(hits.map(_._2): _*)
    val pred = hits.foldRight(lit("zh")) { case ((l, h), els) =>
      when(h === mx, lit(l)).otherwise(els)
    }
    documents.select(
      col("doc_id"),
      when(mx === 0, lit("und")).otherwise(pred).as("lang_pred"))
  }

  /** Whitespace-normalized lowercase text (shared by fingerprints and
    * exact dedup): lower → collapse runs of whitespace → trim.
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** The canonical exact-dup fingerprint: md5 of normalized text. ONE
    * definition shared by docFingerprint, Dedup.exactDups and
    * CorpusPipeline so the three sites can never drift apart (each is
    * oracle- or spec-gated against this exact shape).
    */
  def fingerprintExpr(text: Column): Column =
    md5(normalized(text).cast("binary"))

  /** SURVEY #20: md5 fingerprint of normalized text (DuckDB-oracled). */
  def docFingerprint(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), fingerprintExpr(col("text")).as("fp_md5"))

  /** SURVEY #20 (native half): the rolling-hash Catalyst expression —
    * not SQL-expressible in DuckDB (wrapping 64-bit arithmetic), so the
    * query is rows-only checked and the hash itself is spec'd in
    * RollingHashSpec (codegen vs interpreted vs reference loop).
    */
  def rollingFingerprint(documents: DataFrame): DataFrame = {
    RollingHash.register(documents.sparkSession)
    documents.select(col("doc_id"), expr("rolling_hash(text)").as("fp_rolling"))
  }
}
