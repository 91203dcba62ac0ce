package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair list: pairs → canonical
  * dup GROUPS (doc_id, group_id = min doc_id in its component). Pair
  * emission alone under-deletes: A~B and B~C chains must collapse to
  * one group even when A~C was never emitted.
  *
  * Algorithm: min-label propagation — every vertex starts labeled with
  * itself; each round takes the min of its own and its neighbors'
  * labels; fixpoint when no label changes. Each round is one
  * join + partial-aggregated groupBy (labels and edges shuffle, never
  * payloads); rounds = component diameter, and near-dup components are
  * shallow in practice (stars around a canonical doc). Convergence is
  * detected by the label-sum invariant: labels only ever decrease, so
  * the sum (exact, DECIMAL — a 1e9-vertex sum overflows int64) is
  * strictly monotone until fixpoint — no per-row diff join needed.
  * For adversarially deep graphs the published fix is large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce"), which squares the label-jump per round; the operator
  * caps at `maxIter` and raises rather than silently emitting a
  * half-converged labeling.
  *
  * Only vertices that appear in a pair are labeled — singleton docs
  * need no group and would dominate the output at corpus scale.
  */
object ConnectedComponents {

  /** Unpersist the block-manager blocks behind a localCheckpointed
    * DataFrame (its analyzed plan is the `LogicalRDD` wrapping the
    * checkpointed RDD). `Dataset.unpersist` only touches the cache
    * manager, not checkpoint blocks — without this, a 50-round
    * propagation holds every superseded round's labels in memory until
    * the JVM GCs the references (linear block growth with diameter).
    * Callers must be DONE with the DataFrame: a lazily-checkpointed
    * RDD's lineage is truncated, so unpersisted blocks cannot be
    * recomputed.
    */
  private def dropCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
    }

  def dupGroups(
      pairs: DataFrame,
      aCol: String = "doc_id_a",
      bCol: String = "doc_id_b",
      maxIter: Int = 50): DataFrame = {
    // checkpoint the PAIRS before building edges: the union below reads
    // its input twice (forward + reversed branch), which without this
    // evaluated the whole upstream pair lineage — for the wired dedup
    // query, the shingle inverted index + self-join — twice inside the
    // edges job
    val p = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .localCheckpoint(eager = false)
    val edges = p.union(p.select(col("dst"), col("src")))
      .distinct()
      // lazy: the first round's join materializes it; stored partitions
      // serve every later round without recomputing the pair lineage
      .localCheckpoint(eager = false)
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint(eager = false)

    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)

    var prevSum = labelSum(labels)
    // an empty pair set has no components: sum(empty) is SQL NULL, and
    // looping on it would NPE — return the (empty) labeling directly
    if (prevSum == null) return labels.select(col("v").as("doc_id"), col("label").as("group_id"))
    var iter = 0
    var converged = false
    while (!converged) {
      iter += 1
      require(iter <= maxIter,
        s"connected components did not converge in $maxIter rounds — " +
          "adversarially deep graph; raise maxIter or switch to star contraction")
      val nbrMin = edges.join(labels, edges("src") === labels("v"))
        .groupBy(edges("dst"))
        .agg(min(col("label")).as("nbr_label"))
      val updated = labels.join(nbrMin, labels("v") === nbrMin("dst"), "left")
        .select(labels("v"), least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        // lazy: the labelSum action below materializes it — one job per
        // round instead of two (eager checkpoint + sum)
        .localCheckpoint(eager = false)
      val s = labelSum(updated)
      if (iter == 1) dropCheckpointBlocks(p) // edges are materialized now
      dropCheckpointBlocks(labels) // superseded by `updated`
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = updated
    }
    labels.select(col("v").as("doc_id"), col("label").as("group_id"))
  }
}
