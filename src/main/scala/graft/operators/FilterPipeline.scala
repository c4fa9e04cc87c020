package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composite filter-decision table — the "attribute store" a curation
  * pipeline materializes once per crawl batch: every quality signal as a
  * column, plus the keep/drop decision with the FIRST failing gate as a
  * reason code. Downstream consumers filter on `kept`, analysts group by
  * `reason`, and threshold changes replay against the stored attributes
  * without recomputing them (the expensive part).
  *
  * One linear pass: the per-row signals (token count, language ID,
  * quality score) are codegen'd column functions, and the one aggregation
  * ([[Repetition.profile]]'s n-gram mode) joins back on the id. Gate
  * ORDER is part of the contract — reasons are reproducible only if the
  * first failing gate is deterministic.
  */
object FilterPipeline {

  /** Gate thresholds; fields mirror the reason codes they emit. */
  final case class Gates(
      minTokens: Long = 20,
      maxTokens: Long = 5000,
      maxDupWordFrac: Double = 0.55,
      maxTopNgramFrac: Double = 0.1,
      minQuality: Double = 0.55)

  /** Per-document attributes: (idCol, n_tokens, pred_lang, quality,
    * dup_word_frac, top_bigram_frac). `quality` is rounded to 6 decimals
    * so downstream threshold comparisons can't flip on float noise.
    */
  def attributes(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
        TextFunctions.langId(col(textCol)).as("pred_lang"),
        round(TextFunctions.qualityScore(col(textCol)), 6).as("quality"))
      .join(Repetition.profile(docs, n = 2, idCol, textCol), Seq(idCol))
      .withColumnRenamed("top_ngram_frac", "top_bigram_frac")

  /** Attributes plus (reason, kept). The reason is the FIRST failing gate
    * in the fixed order: too_short, too_long, no_lang, repetitive_words,
    * repetitive_ngrams, low_quality — or 'kept'.
    */
  def decide(docs: DataFrame, gates: Gates = Gates(),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val reason: Column =
      when(col("n_tokens") < gates.minTokens, "too_short")
        .when(col("n_tokens") > gates.maxTokens, "too_long")
        .when(col("pred_lang") === "und", "no_lang")
        .when(col("dup_word_frac") > gates.maxDupWordFrac, "repetitive_words")
        .when(col("top_bigram_frac") > gates.maxTopNgramFrac, "repetitive_ngrams")
        .when(col("quality") < gates.minQuality, "low_quality")
        .otherwise("kept")
    attributes(docs, idCol, textCol)
      .withColumn("reason", reason)
      .withColumn("kept", col("reason") === "kept")
  }
}
