package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion: reciprocal-rank fusion (RRF, Cormack &
  * Clarke 2009) of any number of ranked lists —
  * `fused(d) = Σ_lists 1/(k + rank_d)`, documents absent from a list
  * contributing nothing. Rank-based, so a lexical BM25 list and a dense
  * embedding list fuse WITHOUT score calibration — the standard combiner
  * in retrieval/curation pipelines (and the selection step of
  * retrieval-augmented dataset construction).
  *
  * Shape: one equi-join per additional list over id (each list is
  * top-k-bounded, so every join side is tiny regardless of corpus size)
  * and one top-k over the fused union — never a corpus-sized operation.
  * Fused scores round to `scale` decimals BEFORE ranking (the engine's
  * standing transcendental-oracle discipline) and ties break by id, so
  * the boundary is engine-stable.
  */
object Retrieval {

  /** Fuse ranked lists (each carrying `idCol` and `rankCol`, rank 1 =
    * best) into the RRF top-`topK`: (id, rrf, fused_rank).
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String = "doc_id",
      rankCol: String = "rank", k: Int = 60, topK: Int = 10,
      scale: Int = 6): DataFrame = {
    require(lists.size >= 2, "rrfFuse needs at least two ranked lists")
    require(k >= 1 && topK >= 1, "k and topK must be >= 1")
    val contribs = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), (lit(1.0) / (lit(k) + col(rankCol))).as(s"__c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val fused: Column = contribs.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0))).reduce(_ + _)
    joined.select(col(idCol), round(fused, scale).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
      .withColumn("fused_rank",
        row_number().over(Window.orderBy(col("rrf").desc, col(idCol))).cast("long"))
  }
}
