package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 relevance scoring — keyword retrieval over the corpus, the
  * standard tool for targeted curation (pull the documents most relevant
  * to a topic mix) and for seed-query dataset bootstrapping. Uses the
  * Lucene/ATIRE BM25 variant whose idf term
  * `ln((N - df + 0.5)/(df + 0.5) + 1)` is always positive.
  *
  * Distributed shape: the query's term list is a LITERAL, so each term
  * becomes a conditional-sum column in ONE wide aggregation over one
  * explode of the corpus — per-doc length and every per-term tf in a
  * single map-side-combined pass, no postings join, no second scan. The
  * corpus constants (N, avgdl, per-term df) come from a 1-row aggregate
  * of that table and ride a broadcast; scoring is pure column
  * arithmetic. Ranking is Spark's distributed TopK (`orderBy.limit`),
  * not a global window — only the bounded top-k rows see the rank
  * assignment. (A postings-join form only wins when the "query" is
  * itself a large relation; for query-sized term lists the wide
  * aggregation is strictly fewer shuffles.)
  */
object Bm25 {

  /** Top-`topK` documents by BM25 score for `terms`:
    * (idCol, score, rank). Scores are rounded to `scale` decimals
    * BEFORE ranking so cross-engine float noise can't reorder the
    * boundary; ties break by ascending id. Documents matching no term
    * are absent.
    */
  def topDocs(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20, scale: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "BM25 needs at least one query term")
    def tf(i: Int) = col(s"__tf$i")
    def df(i: Int) = col(s"__df$i")

    val w = docs.select(col(idCol),
      explode(split(trim(col(textCol)), TextFunctions.WS + "+")).as("tok"))
    val perDoc = w.groupBy(idCol).agg(
      count(lit(1)).as("dl"),
      ts.zipWithIndex.map { case (t, i) =>
        sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"__tf$i")
      }: _*)
    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n"),
      (avg("dl").as("avgdl") +:
        ts.indices.map(i => sum((tf(i) > 0).cast("long")).cast("double").as(s"__df$i"))): _*)

    val contrib: Column = ts.indices.map { i =>
      val idf = log((col("n") - df(i) + 0.5) / (df(i) + 0.5) + 1.0)
      val norm = tf(i) + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
      when(tf(i) > 0, idf * tf(i) * (k1 + 1) / norm).otherwise(lit(0.0))
    }.reduce(_ + _)

    val scored = perDoc
      .filter(ts.indices.map(i => tf(i) > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col(idCol), round(contrib, scale).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol))).cast("long"))
  }
}
