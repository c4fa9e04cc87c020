package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary and unigram statistics — the tokenizer-training and
  * LM-scoring steps of a data pipeline.
  *
  * `build` produces the deterministic top-`size` vocabulary (count desc,
  * token asc — the tie order every tokenizer trainer fixes so retrains
  * are reproducible). The plan is the scalable top-k shape: distributed
  * word count, `orderBy(...).limit(size)` (Spark's distributed TopK — no
  * global sort materializes), and only the BOUNDED `size` rows pass
  * through the id-assignment window.
  *
  * `surprisal` scores each document by its average unigram surprisal
  * −ln p(w) under the corpus' own unigram distribution — the cheap
  * perplexity proxy used as a quality gate (gibberish and boilerplate
  * both sit in the tails). Two aggregation passes plus one broadcast-able
  * frequency join; no per-row vocabulary structure.
  */
object Vocabulary {

  private def words(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      explode(split(trim(col(textCol)), TextFunctions.WS + "+")).as("tok"))

  /** Top-`size` vocabulary: (id, tok, cnt), id = 1-based rank by
    * (count desc, token asc).
    */
  def build(docs: DataFrame, size: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    words(docs, idCol, textCol)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(size)
      .withColumn("id", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
      .select(col("id"), col("tok"), col("cnt"))

  /** Per-document average unigram surprisal under the corpus' own
    * distribution: (idCol, n_toks, avg_surprisal). `scale` rounds the
    * result (surprisal is a transcendental of a ratio — rounding keeps it
    * comparable across engines/libms).
    */
  def surprisal(docs: DataFrame, scale: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = words(docs, idCol, textCol)
    val freq = w.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum("cnt").as("n"))
    w.join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("sup", -log(col("cnt").cast("double") / col("n")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        round(avg(col("sup")), scale).as("avg_surprisal"))
  }
}
