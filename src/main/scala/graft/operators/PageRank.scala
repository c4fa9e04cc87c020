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

  /** [[run]] in EXACT fixed-point integer arithmetic — the
    * oracle-checkable twin: ranks are BIGINT multiples of 1/`scale`,
    * every step is integer sum + truncating division (damping 0.85 as
    * the rational 17/20), so two engines replaying the same iterations
    * agree BIT-EXACTLY — no summation-order ulps, no rounding-boundary
    * flakiness — and a fixed-iteration external replay (chained SQL
    * CTEs) can hash-match the ranks themselves. Truncation loses at
    * most deg(b)/scale mass per node per round (~1e-9 relative at the
    * default scale over 10 rounds — DedupSimilaritySpec pins agreement
    * with the float form), always downward, deterministically.
    *
    * Same shape at scale as [[run]]: one equi-join + groupBy-sum per
    * round over the checkpointed edge relation.
    *
    * @return (doc_id, rank_e12) with rank_e12 ≲ scale · rank
    */
  def runExact(pairs: DataFrame, iterations: Int = 10,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val sym = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
    val deg = sym.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val edges = sym.join(deg, "a").localCheckpoint()
    val n = deg.count()
    // driver-side Long division == SQL integer division on positives
    val teleport = (3L * scale / 20L) / n
    var ranks = deg.select(col("a").as("id"), lit(scale / n).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val next = edges
        .join(ranks, edges("a") === ranks("id"))
        .groupBy(col("b")).agg(sum(expr("rank div deg")).as("m"))
        .select(col("b").as("id"),
          (lit(teleport) + expr("(17 * m) div 20")).as("rank"))
        .localCheckpoint()
      Checkpoints.release(ranks)
      ranks = next
    }
    Checkpoints.release(edges)
    ranks.select(col("id").as("doc_id"), col("rank").as("rank_e12"))
  }
}
