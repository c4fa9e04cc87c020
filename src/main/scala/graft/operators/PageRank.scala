package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an undirected edge list — the centrality layer above
  * [[DedupComponents]]: where components answer "which documents form one
  * duplicate cluster", rank answers "which member is the hub the others
  * orbit" (a popularity-weighted alternative to q95's quality argmax, and
  * the standard importance prior for crawl/link graphs).
  *
  * Shape at scale: the symmetrized edge list with per-source degree is
  * materialized ONCE (`localCheckpoint`, same discipline as
  * DedupComponents); each iteration is one equi-join of current ranks
  * into that edge table plus one groupBy-sum — all narrow, rank-table-
  * sized state, no driver-side graph. Undirected graphs have no dangling
  * nodes (every node has degree ≥ 1 by construction), so rank mass is
  * conserved exactly at Σ = 1 and the uniform teleport term needs no
  * dangling redistribution pass.
  */
object PageRank {

  /** Ranks for every node appearing in `pairs` (columns `doc_a`,
    * `doc_b`). Fixed iteration count — rank is a scoring pass, not a
    * fixpoint search; 10-15 rounds is the standard operating point and
    * keeps the job count deterministic for a given input.
    *
    * @return (doc_id, rank) with Σ rank = 1
    */
  def run(pairs: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val sym = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
    val deg = sym.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    // one reusable (a, b, deg-of-a) relation for every round
    val edges = sym.join(deg, "a").localCheckpoint()

    val n = deg.count()
    var ranks = deg.select(col("a").as("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val next = edges
        .join(ranks, edges("a") === ranks("id"))
        .groupBy(col("b")).agg(sum(col("rank") / col("deg")).as("m"))
        .select(col("b").as("id"),
          (lit((1 - damping) / n) + lit(damping) * col("m")).as("rank"))
        // truncate the lineage each round or the plan doubles per
        // iteration and the optimizer re-derives the whole chain
        .localCheckpoint()
      // the checkpoint above is EAGER, so next no longer reads the old
      // rank blocks — drop them now or every round's copy stays resident
      // (10+ live rank tables per run; the q117 warm-run regression)
      Checkpoints.release(ranks)
      ranks = next
    }
    // the final ranks checkpoint is the only state the returned plan
    // still needs; the edge relation served its last join above
    Checkpoints.release(edges)
    ranks.select(col("id").as("doc_id"), col("rank"))
  }
}
