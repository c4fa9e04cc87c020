package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k for a bounded query set —
  *   corpus-streamed, queries broadcast, so it scales with |corpus|, not
  *   |corpus|² (the correctness baseline).
  * - `neardupPairs`: exact all-pairs threshold join (small corpora /
  *   validation only — quadratic by nature).
  * - `lshTopK`: random-hyperplane LSH bucketing — the 100 TB path: each
  *   of `ntables` tables hashes every vector to an `nbits`-bit bucket;
  *   only same-bucket pairs are scored. Hyperplanes are generated from a
  *   fixed seed, so results are deterministic.
  */
object Similarity {

  private def withNorm(df: DataFrame, idCol: String, vecCol: String, p: String): DataFrame =
    df.select(col(idCol).as(p + "id"), col(vecCol).as(p + "vec"))
      .withColumn(p + "norm", fnorm(col(p + "vec")))

  /** Exact top-k neighbors (cosine) of each query among the corpus.
    * Output: (vec_id, neighbor_id, cos, rn).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "c_")
    val q = withNorm(queries, idCol, vecCol, "q_")
    rank(c.join(broadcast(q), col("q_id") =!= col("c_id")), k)
  }

  private def rank(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("cos", fdot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("c_id").as("neighbor_id"), col("cos"), col("rn"))

  /** Exact pairs with cosine ≥ threshold (embedding near-dup). */
  def neardupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = withNorm(corpus, idCol, vecCol, "a_")
    val b = withNorm(corpus, idCol, vecCol, "b_")
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", fdot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
  }

  /** Deterministic gaussian hyperplanes (fixed seed per table). */
  private[operators] def planes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket key of a vector under a set of hyperplanes. */
  private def bucketKey(vec: Column, ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      when(fdot(vec, typedlit(p.toSeq)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k via multi-table hyperplane LSH. Candidates are the
    * union over tables of same-bucket (query, corpus) pairs; exact cosine
    * ranks the candidates. Output: (vec_id, neighbor_id, cos, rn).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nbits: Int = 8, ntables: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val c = withNorm(corpus, idCol, vecCol, "c_")
    val q = withNorm(queries, idCol, vecCol, "q_")
    val cands = (0 until ntables).map { t =>
      val ps = planes(dim, nbits, seed = 42L + t)
      c.withColumn("bucket", bucketKey(col("c_vec"), ps))
        .join(broadcast(q.withColumn("bucket", bucketKey(col("q_vec"), ps))), Seq("bucket"))
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"))
    }.reduce(_ union _).distinct()
    val scored = cands
      .join(c, Seq("c_id")).join(broadcast(q), Seq("q_id"))
    rank(scored, k)
  }
}
