package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair edges — turns pairwise
  * dedup output (q33/q34 shapes) into cluster-level keep/drop decisions
  * (keeper = min doc_id per component, the exact-dedup convention).
  *
  * Iterative min-label propagation PLUS pointer jumping: each round every
  * node adopts the smallest label among itself and its neighbors (moves
  * the frontier one hop), then `label := label(label)` (halves remaining
  * chain depth — labels are node ids, so the label table joins itself).
  * Convergence is O(log diameter) rounds, not O(diameter): a transitive
  * near-dup CHAIN — common in web-scale corpora — of length 1000 finishes
  * in ~10 rounds where plain propagation needs 1000 and would trip
  * maxIters. Each round is two narrow joins + one groupBy — all
  * distributed — and labels are `localCheckpoint`ed per round: iterative
  * plans are the one place caching is mandatory, otherwise lineage (and
  * recomputation) doubles every round.
  */
object DedupComponents {

  /** @param pairs DataFrame with long columns (doc_a, doc_b), one row per
    *              undirected dup edge
    * @return (doc_id, component, comp_size) for every node that appears in
    *         a pair; component = min doc_id reachable, comp_size = nodes in
    *         the component
    */
  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .localCheckpoint()

    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // (non-convergence after the loop throws — see below)
      // smallest neighbor label per node
      val neighborMin = edges
        .join(labels, edges("b") === labels("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nmin"))
      val stepped = labels
        .join(neighborMin, labels("node") === neighborMin("a"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // pointer jumping: label := label(label). Every label is itself a
      // node of the graph (labels start as node ids and only ever move to
      // other node ids), so the lookup joins the CHECKPOINTED label table
      // of the round start — no recompute of the stepped subtree, and the
      // one-round lag does not break the multiplicative reach growth.
      // The changed-label count rides the SAME job that materializes the
      // new labels (observe + the checkpoint action) — a separate
      // convergence action would double the jobs per round.
      val obs = new org.apache.spark.sql.Observation()
      val next = stepped
        .join(labels.select(col("node").as("p_node"), col("label").as("p_label")),
          col("label") === col("p_node"), "left")
        .select(col("node"), col("old"),
          least(col("label"), coalesce(col("p_label"), col("label"))).as("label"))
        .observe(obs, count(when(col("label") =!= col("old"), lit(1))).as("changed"))
        .select(col("node"), col("label"))
        .localCheckpoint()
      converged = obs.get.getOrElse("changed", 0L).asInstanceOf[Long] == 0L
      // next is eagerly materialized — the round-start label blocks are
      // dead; unpersist or every round's copy stays resident for the
      // whole run (same retention bug as PageRank's q117 regression)
      Checkpoints.release(labels)
      labels = next
      iter += 1
    }
    // silent truncation would under-merge (duplicates survive) and diverge
    // from any exact-closure oracle — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"label propagation did not converge in $maxIters rounds — component " +
        s"diameter exceeds $maxIters; raise maxIters")

    // the final label checkpoint is all the returned plan needs
    Checkpoints.release(edges)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("comp_size"))
    labels.join(sizes, Seq("label"))
      .select(col("node").as("doc_id"), col("label").as("component"), col("comp_size"))
  }
}
