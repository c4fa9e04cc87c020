package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the linear hashed-bag-of-words scorer
  * (the fasttext-classifier shape) that sits between heuristic gates
  * ([[Gopher]]) and training in every large corpus pipeline: rank each
  * document by the mean weight of its words under a trained model, keep
  * the top.
  *
  * The model is a bounded (bucket, weight) table — trained offline,
  * arriving as data, never code — BROADCAST to the token stream:
  * scoring is explode → md5-hex bucket → broadcast left join → avg, all
  * relational, no per-row UDF, linear in tokens at any corpus size.
  * Buckets use the repo's fixed-width md5-hex discipline ([[Dsir]] /
  * [[Sampling]]): first `hexChars` hex chars of md5(word) — a pure
  * function of the word, uniform, and exactly replayable in ANSI SQL,
  * so the entire scoring decision sits under the DuckDB oracle (q122).
  * Words absent from the model contribute `defaultWeight` (the
  * out-of-vocabulary mass), not a dropped row — a doc of unseen words
  * scores `defaultWeight`, never NULL.
  *
  * Reference analogue: the per-file accept/skip decisions of
  * `HDFSMerge.java:161-173` — here the decision is a learned per-row
  * score, same pipeline position.
  */
object QualityModel {

  /** Hex feature bucket of a word: first `hexChars` chars of md5. */
  def bucket(c: Column, hexChars: Int): Column = substring(md5(c), 1, hexChars)

  /** Per-document linear score: (idCol, n_words, score), score = the
    * mean over word OCCURRENCES of weight(bucket(word)) rounded to
    * `scale` decimals (the transcendental-oracle discipline — float
    * summation order differs across engines). Documents with no words
    * (NULL/empty/whitespace-only text) are absent: they have no
    * occurrences to average.
    */
  def score(docs: DataFrame, weights: DataFrame, hexChars: Int = 3,
      defaultWeight: Double = 0.0, scale: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val occ = docs
      .select(col(idCol),
        explode(split(trim(col(textCol)), TextFunctions.WS + "+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col(idCol), bucket(col("w"), hexChars).as("bucket"))
    occ
      .join(broadcast(weights.select(col("bucket"), col("weight"))), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        round(avg(coalesce(col("weight"), lit(defaultWeight))), scale).as("score"))
  }
}
