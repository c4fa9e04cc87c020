package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023): semantic deduplication by embedding —
  * cluster the corpus with spherical k-means, then call two documents
  * duplicates when their embeddings' cosine exceeds a threshold WITHIN a
  * cluster. Cross-cluster near-duplicates are out of scope by design:
  * clustering is what makes the pair search tractable (per-cell
  * quadratic, n²/k total candidate volume instead of n²), and the paper's
  * observation is that semantic duplicates land in the same cell at any
  * reasonable k.
  *
  * Scale shape: assignment is [[IvfAnn.withNearestCid]] (expression form
  * at small k, broadcast-join form beyond 64 centroids); the pair search
  * is an equi-join on the cell id — the same shuffle shape as every other
  * dedup path here, never an unblocked cross product. At 100 TB you raise
  * k so cells stay bounded (the paper runs k ≈ 50k on 5 B docs) and train
  * on a sample via [[IvfAnn.trainOrLoad]]'s artifact path.
  *
  * Drop rule: within a pair, the HIGHER id is the duplicate — so `kept`
  * is "has no lower-id in-cluster duplicate". Deterministic, one
  * anti-join; transitive chains collapse to the lowest id without a
  * components pass (a ≥-threshold chain inside one cell is exactly the
  * situation where SemDeDup wants one survivor).
  */
object SemDedup {

  /** corpus + (cid, unit norm) under the model — shared by pairs and
    * decisions. Columns: id, vec, nrm, cid.
    */
  private def assigned(corpus: DataFrame, m: IvfAnn.Model,
      idCol: String, vecCol: String): DataFrame =
    IvfAnn.withNearestCid(corpus.sparkSession,
        corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
          .withColumn("nrm", fnorm(col("vec")))
          .withColumn("__vd", asDouble(col("vec"))),
        m, "id", "__vd")
      .drop("__vd")

  private def pairsFrom(a: DataFrame, threshold: Double): DataFrame =
    a.as("a").join(a.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .withColumn("cos", fdot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"), col("a.cid").as("cid"))

  /** In-cluster duplicate pairs: (doc_a, doc_b, cid) with doc_a < doc_b
    * and cosine ≥ threshold. Always a SUBSET of the exact all-pairs set
    * ([[Similarity.neardupPairs]]); equal to it when k = 1.
    */
  def pairs(corpus: DataFrame, m: IvfAnn.Model, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pairsFrom(assigned(corpus, m, idCol, vecCol), threshold)

  /** The per-document decision table: (idCol, cid, kept). kept = false
    * iff the document has an in-cluster neighbor with cosine ≥ threshold
    * and a lower id.
    */
  def decisions(corpus: DataFrame, m: IvfAnn.Model, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = assigned(corpus, m, idCol, vecCol)
    val dropped = pairsFrom(a, threshold).select(col("doc_b").as("id")).distinct()
    a.select(col("id"), col("cid"))
      .join(dropped.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cid"),
        not(coalesce(col("__dup"), lit(false))).as("kept"))
  }
}
