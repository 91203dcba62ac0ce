package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches (SURVEY §2 — LLM-pipeline
  * block): documents are conceptually concatenated in doc_id order and
  * chunked into fixed token-budget packs ("concat-then-chunk"), the
  * layout step between a cleaned corpus and a tokenized training shard.
  * The reference has no packing surface; engine-native design.
  *
  * Each document's pack coordinates are a pure function of the EXCLUSIVE
  * prefix sum of token counts in doc_id order. A naive global
  * `Window.orderBy(doc_id)` computes that with ONE task holding the
  * whole corpus — the classic unpartitioned-window scale killer. This
  * operator runs the textbook two-phase distributed prefix sum instead:
  *
  *   1. bucket docs by contiguous doc_id range, with range boundaries
  *      taken from an `approx_percentile` sketch of the doc_id
  *      distribution — equal-FREQUENCY buckets, so clustered/sparse id
  *      spaces still split phase 2 into ~equal row counts, and no
  *      arithmetic on the raw id span that could overflow a Long. Any
  *      monotone-in-doc_id assignment yields identical pack coordinates
  *      (the prefix sum is over global doc_id order either way), so the
  *      sketch's approximation error costs balance, never correctness;
  *   2. per-bucket prefix sums via a PARTITIONED window (parallel across
  *      buckets);
  *   3. per-bucket totals (#buckets rows) get their own exclusive prefix
  *      sum on a single tiny task, then broadcast back as offsets.
  *
  * Wall-clock is dominated by phase 2, which parallelizes across
  * `buckets`; the serial phase 3 touches `buckets` rows total. At
  * 100 TB, raise `buckets` toward the cluster's task count — the
  * broadcast stays KB-sized.
  */
object Packing {

  /** Pack coordinates per document: the pack its first token lands in,
    * the offset inside that pack, and how many packs it spans (an empty
    * document spans the 1 pack it sits at the boundary of). Token counts
    * are whitespace tokens (TextOps.tokenCount's n_ws_tokens), the same
    * notion the token-count query oracles.
    */
  def packSequences(
      documents: DataFrame,
      tokenBudget: Int = 2048,
      buckets: Int = 32): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // (doc_id, n_tokens) only — the corpus text never leaves the scan
    // stage; everything after this line moves two longs per doc. The
    // checkpoint makes the stats single-pass: the percentile sketch,
    // per-bucket sums, and the final projection would each re-run the
    // text scan otherwise.
    val t = TextOps.tokenCount(documents)
      .select(col("doc_id"), col("n_ws_tokens").cast("long").as("n_tokens"))
      // EAGER (r16 audit): the percentile-cut aggregate feeds a
      // broadcast() — an async build job that, lazy, races the main
      // job for these blocks and re-runs the corpus scan + token
      // kernel per loser (the Sampling.shuffleShard shape).
      .localCheckpoint(eager = true)
    // bucket = how many percentile cut points lie strictly below this
    // doc_id — monotone in doc_id (cuts are sorted), bounded in
    // [0, buckets), O(buckets) comparisons per row inside codegen, and
    // free of raw-span arithmetic (the old uniform-width formula
    // `(doc_id - lo) * buckets DIV span` overflowed Long once the id
    // span exceeded ~2^63/buckets, and collapsed phase 2 onto one task
    // when ids clustered in a narrow band of a wide span).
    val bucketed =
      if (buckets == 1) t.withColumn("bucket", lit(0))
      else {
        val fracs = (1 until buckets).map(i => i.toDouble / buckets).mkString(", ")
        val cuts = t.agg(
          expr(s"approx_percentile(doc_id, array($fracs), 10000)").as("cuts"))
        t.crossJoin(broadcast(cuts))
          .withColumn("bucket",
            expr("CAST(aggregate(cuts, 0, (acc, c) -> acc + IF(doc_id > c, 1, 0)) AS INT)"))
          .drop("cuts")
      }
    val wLocal = Window.partitionBy("bucket").orderBy("doc_id")
    // materialized once (4 longs per doc): both consumers — the final
    // projection and the per-bucket totals — would otherwise each run
    // their own bucket shuffle + window over the stats table
    val local = bucketed.withColumn("lcum", sum(col("n_tokens")).over(wLocal))
      // EAGER (r16 audit): the per-bucket totals feed a broadcast() —
      // same async-build race as `t` above.
      .localCheckpoint(eager = true)
    // phase 3: exclusive prefix sum over the per-bucket totals — a
    // deliberately unpartitioned window over exactly `buckets` rows.
    val wOffset = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("bucket").agg(sum("n_tokens").as("btot"))
      .withColumn("bucket_offset", coalesce(sum("btot").over(wOffset), lit(0L)))
      .select("bucket", "bucket_offset")
    local.join(broadcast(offsets), "bucket")
      .withColumn("pstart", col("bucket_offset") + col("lcum") - col("n_tokens"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        expr(s"pstart DIV $tokenBudget").as("pack_id"),
        pmod(col("pstart"), lit(tokenBudget.toLong)).as("pack_offset"),
        (expr(s"(pstart + greatest(n_tokens, 1) - 1) DIV $tokenBudget")
          - expr(s"pstart DIV $tokenBudget") + lit(1L)).as("n_packs_spanned"))
  }
}
