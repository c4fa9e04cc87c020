package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 relevance scoring — keyword retrieval over the corpus, the
  * standard tool for targeted curation (pull the documents most relevant
  * to a topic mix) and for seed-query dataset bootstrapping. Uses the
  * Lucene/ATIRE BM25 variant whose idf term
  * `ln((N - df + 0.5)/(df + 0.5) + 1)` is always positive.
  *
  * Distributed shape: term frequencies come from one explode +
  * `isin(terms)` filter (the filter reaches the scan side of the
  * shuffle, so only query-term postings move), document lengths from a
  * map-side-combined count, and the corpus constants (N, avgdl) ride a
  * broadcast 1-row aggregate. Ranking is Spark's distributed TopK
  * (`orderBy.limit`), not a global window — only the bounded top-k rows
  * see the rank assignment.
  */
object Bm25 {

  /** Top-`topK` documents by BM25 score for `terms`:
    * (idCol, score, rank). Scores are rounded to `scale` decimals
    * BEFORE ranking so cross-engine float noise can't reorder the
    * boundary; ties break by ascending id.
    */
  def topDocs(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20, scale: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val w = docs.select(col(idCol),
      explode(split(trim(col(textCol)), TextFunctions.WS + "+")).as("tok"))
    val dl = w.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(
      count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
    val tf = w.filter(col("tok").isin(terms: _*))
      .groupBy(col(idCol), col("tok").as("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(countDistinct(col(idCol)).as("df"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
    val contrib = idf * col("tf") * (k1 + 1) / norm
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .groupBy(idCol)
      .agg(round(sum(contrib), scale).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol))).cast("long"))
  }
}
