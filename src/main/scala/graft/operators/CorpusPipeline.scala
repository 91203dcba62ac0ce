package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning: the composition a 100 TB
  * LLM-data pipeline actually runs — quality gate → exact dedup →
  * near-dup (MinHash-LSH) dedup — expressed entirely from the operators
  * in this package so each stage keeps its documented shuffle discipline.
  *
  * Stage order matters at scale: the cheap per-row quality filter prunes
  * the corpus BEFORE any shuffle; exact dedup (one hash shuffle) removes
  * identical payloads before the costlier LSH candidate generation; the
  * near-dup stage drops the higher-doc_id member of each verified pair.
  */
object CorpusPipeline {

  /** The staged pipeline, built once: each stage output is materialized
    * EAGERLY (localCheckpoint) because every stage has ≥2 consumers —
    * the next stage plus the final/report reads — and those consumers
    * are independent stages of the SAME downstream job: a lazy
    * checkpoint only stores partitions as whichever consumer's tasks
    * compute them first, so concurrent consumers race the block store
    * and re-run the stage's regex/window lineage per racing branch.
    * Measured (r15): with lazy checkpoints the race held q_corpus_clean
    * at 23.8× wall for 10× data at sf10→sf100 (shuffle exactly linear,
    * 11.0×) and q_corpus_clean_full at ~81 s against ~10 s of
    * single-evaluation work at sf10 — the per-row regex stages are
    * precisely the most expensive thing to evaluate twice. r16
    * re-measured the decade at post-audit HEAD (SCALING_r16
    * `fourth_decade_sf10_to_sf100`): q_corpus_clean wall ratio is
    * 8.85× for 10× data with shuffle 11.02× — the race term is gone
    * from the committed artifact, not just from a comment. Eager
    * materialization runs the stage pipeline once, at build time; the
    * jobs it fronts are the same work the first action paid anyway.
    * This operator is in the README's "Eager construction" class —
    * build once and reuse, never construct in a loop.
    * Callers therefore get an EAGER-construction surface (two Spark
    * jobs run inside cleanCorpus/stageReport before any action) —
    * build once and reuse, as with Decontaminate.flagged.
    */
  private final case class Stages(scored: DataFrame, canonical: DataFrame, cleaned: DataFrame)

  /** @param needScored whether the caller reads `Stages.scored` as its
    *   own frame (stageReport's quality-gate count). cleanCorpus does
    *   NOT — its only consumer of stage 1 is stage 2's lineage — so the
    *   scored checkpoint there was one full materialization job whose
    *   blocks were read exactly once, by the very next job (r20, guide
    *   §1.2: don't store what has a single consumer). With it elided,
    *   the kernel chain (redact → gopher → quality) still evaluates
    *   exactly once — inside stage 2's eager checkpoint job, fused with
    *   the fingerprint window's exchange — and stage 2's checkpoint
    *   remains the multi-consumer barrier it always was.
    */
  private def build(
      documents: DataFrame, minQuality: Double, jaccardThreshold: Double,
      redactPii: Boolean = false, gopherRules: Boolean = false,
      needScored: Boolean = true): Stages = {
    // CPU-spread guard (r19, shared [[CpuSpread]]): stage 1 fuses the
    // round's heaviest per-row kernels (redaction, Gopher stats,
    // quality, fingerprint) into the scan stage — on an unsplittable
    // single-row-group local table that whole chain ran on ONE task
    // (measured: a 1.0 s single-task stage dominating the steady-state
    // 2.0 s wall at sf0.1). One round-robin exchange of the input rows
    // buys full-core kernels; a many-file corpus at scale takes the
    // no-op branch (no exchange added). Row placement only — every
    // downstream stage keys by content.
    val spread = CpuSpread.spread(documents)
    // 0. optional PII redaction — a second projection fused into the
    // same scan stage (no exchange): redact BEFORE the quality gate so
    // scoring and both dedup stages see the text that would actually
    // ship. Off by default; the standalone q_redact_pii query gates the
    // kernel itself.
    val redacted =
      if (!redactPii) spread
      else spread.select(
        col("doc_id"),
        graft.functions.PiiRedact.redacted(col("text")).getField("clean").as("text"))
    // 0b. optional Gopher-rules gate — a stateless filter in the same
    // scan stage (one fused GopherStats pass); off by default, the
    // standalone q_quality_filter_gopher query gates the rules. The
    // streaming twin (StreamingJobs.corpusIngestStream) composes the
    // identical expressions behind the same flags.
    val input =
      if (!gopherRules) redacted
      else redacted.filter(TextOps.gopherKeepExpr(col("text")))
    // 1. per-row quality gate — a pure projection + filter inside the
    // scan stage (qualityExpr attaches the score without the join a
    // (doc_id → score) lookup would need)
    val scoredPlan = input
      .select(col("doc_id"), col("text"),
        TextOps.qualityExpr(col("text")).as("quality_score"))
      .filter(col("quality_score") >= minQuality)
    // the stage-1 checkpoint exists for stageReport's second consumer;
    // with one consumer (cleanCorpus) it is elided — see `needScored`
    val scored = if (needScored) scoredPlan.localCheckpoint(true) else scoredPlan
    // 2. exact dedup — keep the canonical (min doc_id) of each group.
    // The min-id window rides the single fingerprint shuffle; joining
    // exactDups back by doc_id would move the text a second time.
    val canonical = scored
      .withColumn("fp_md5", TextOps.fingerprintExpr(col("text")))
      .withColumn("canonical_id", min(col("doc_id")).over(Window.partitionBy("fp_md5")))
      .filter(col("doc_id") === col("canonical_id"))
      .drop("fp_md5", "canonical_id")
      .localCheckpoint(true)
    // 3. near-dup dedup — drop the higher doc_id of each verified pair
    val dropIds = Dedup.minhashLshPairs(canonical, jaccardThreshold)
      .select(col("doc_id_b").as("doc_id")).distinct()
    Stages(scored, canonical, canonical.join(dropIds, Seq("doc_id"), "left_anti"))
  }

  /** Cleaned corpus: (doc_id, text, quality_score) for documents that
    * pass the quality floor, are their exact-dup group's canonical
    * representative, and are not the dropped side of a near-dup pair.
    *
    * Hot-bucket drop monitoring: run `Dedup.minhashLshPairs(canonical,
    * thr, dropObs = Some(obs))` DIRECTLY and act on a non-zero
    * `dropped_memberships` (the DedupSpec hot-bucket test shows the
    * pattern). An Observation threaded through this pipeline would sit
    * under the anti-join's broadcast stage, where Spark does not deliver
    * observed metrics — a hook that silently reads zero is worse than
    * none, so this surface deliberately doesn't offer one.
    */
  def cleanCorpus(
      documents: DataFrame,
      minQuality: Double = 0.5,
      jaccardThreshold: Double = 0.8,
      redactPii: Boolean = false,
      gopherRules: Boolean = false): DataFrame =
    build(documents, minQuality, jaccardThreshold, redactPii, gopherRules,
      needScored = false).cleaned

  /** Per-stage survivor counts — the pipeline's audit trail (silent
    * shrinkage is how corpus bugs ship). Shares the staged build with
    * [[cleanCorpus]], so the report always describes the pipeline that
    * actually runs. The four counts are a UNION of global aggregates —
    * one Spark job over the checkpointed stages when the consumer
    * materializes it, not four sequential driver actions (global agg,
    * not groupBy(lit): an empty stage must still report a 0 row).
    */
  def stageReport(
      documents: DataFrame,
      minQuality: Double = 0.5,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val st = build(documents, minQuality, jaccardThreshold)
    Seq(
      ("input", documents),
      ("quality_gate", st.scored),
      ("exact_dedup", st.canonical),
      ("near_dedup", st.cleaned))
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
      }
      .reduce(_ unionByName _)
  }
}
