package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination (SURVEY §2 — LLM-pipeline block): find and
  * remove training documents that contain a benchmark/eval document,
  * the step every corpus build runs so the model isn't graded on its
  * own training data. The reference has no decontamination surface;
  * engine-native design.
  *
  * Overlap metric: Jaccard CONTAINMENT of the eval doc in the training
  * doc — |shingles(train) ∩ shingles(eval)| / |shingles(eval)| — the
  * standard decontamination measure (symmetric Jaccard under-fires
  * when a long training doc embeds a short eval doc verbatim).
  *
  * Scale shape: the eval set is SMALL by construction (benchmarks are
  * thousands of docs, the corpus is billions), so its shingle index is
  * BROADCAST — the corpus side is scanned once, joined map-side with
  * no shuffle, and the only exchange is the partial-aggregated overlap
  * count keyed by (train doc, eval doc) — a join hit, not a corpus
  * row. A 100 TB corpus passes through in one wave of map tasks.
  */
object Decontaminate {

  /** Flagged (doc_id, eval_id, containment) pairs at or above the
    * containment floor — the audit artifact reviewed before dropping.
    *
    * Input contract (ADVICE r12): doc_ids must be UNIQUE within EACH
    * input — both sides' set semantics come from the per-row
    * `shingles_distinct` generator, so a duplicated id would emit
    * duplicate (id, shingle) rows, inflate n_eval and n_common, and
    * push containment past 1.0 (the corpus-wide distincts this shape
    * replaced used to absorb that). Both wired producers pass the
    * documents-table key, which is unique by construction.
    */
  def flagged(
      corpus: DataFrame,
      evalDocs: DataFrame,
      minContainment: Double = 0.5): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0,1], got $minContainment")
    val evalInv = Dedup.shingleIndex(evalDocs)
    val evalSizes = evalInv.groupBy("doc_id").agg(count(lit(1)).as("n_eval"))
    val evalSide = evalInv.join(evalSizes, "doc_id")
      .select(col("doc_id").as("eval_id"), col("shingle"), col("n_eval"))
    // The corpus side dedupes shingles WITHIN each document map-side
    // (shingles_distinct: per-row set semantics streamed inside the
    // scan stage — never a corpus-wide distinct, which would shuffle
    // the whole corpus index before the join). Both join inputs then
    // carry set semantics — shingleIndex distincts the eval side — so
    // each common shingle of a (train, eval) pair matches EXACTLY once
    // and a plain count IS the distinct-intersection size: the same
    // integer the previous countDistinct computed, feeding the
    // IDENTICAL division, so the flagged set is bit-identical. The win
    // is the aggregate's exchange: partial counts combine map-side to
    // one (train, eval) row per partition — the countDistinct rewrite
    // instead shuffled every distinct (train, eval, shingle-STRING)
    // triple to dedupe globally before counting, a hit-set-sized
    // string shuffle that grows with corpus×eval overlap.
    graft.functions.ShingleGenerator.register(corpus.sparkSession)
    corpus.selectExpr("doc_id", "shingles_distinct(text) AS shingle")
      .join(broadcast(evalSide), "shingle")
      .groupBy(col("doc_id"), col("eval_id"), col("n_eval"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("containment",
        col("n_common").cast("double") / col("n_eval").cast("double"))
      .filter(col("containment") >= minContainment)
      .select("doc_id", "eval_id", "containment")
  }

  /** The corpus minus every document flagged against any eval doc. */
  def clean(
      corpus: DataFrame,
      evalDocs: DataFrame,
      minContainment: Double = 0.5): DataFrame =
    corpus.join(
      flagged(corpus, evalDocs, minContainment).select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")
}
