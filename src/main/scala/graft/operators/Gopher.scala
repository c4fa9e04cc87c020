package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher document-quality rules (Rae et al. 2021, §A1.1) that
  * [[FilterPipeline]]'s composite gates don't already carry — per-word
  * shape statistics and line-shape statistics, each a pure codegen'd
  * column expression over one split of the text (no UDFs, no extra
  * scans; every signal is SQL-mirrorable so the whole row goes under the
  * DuckDB oracle).
  *
  * Signals:
  *  - `mean_word_len` — mean characters per whitespace word (Gopher
  *    keeps 3..10).
  *  - `alpha_word_frac` — fraction of words containing at least one
  *    ASCII letter (Gopher requires ≥ 0.8).
  *  - `symbol_word_ratio` — '#' and '…'/'...' occurrences per word
  *    (Gopher drops > 0.1).
  *  - `bullet_line_frac` / `ellipsis_line_frac` — fraction of lines
  *    starting with a bullet (Gopher drops > 0.9) / ending with an
  *    ellipsis (drops > 0.3).
  *  - `stopword_hits` — how many of Gopher's required stopwords ("the",
  *    "be", "to", "of", "and", "that", "have", "with") appear (Gopher
  *    requires ≥ 2 distinct).
  */
object Gopher {

  /** Gopher's "required word" list — distinct HITS among these gate the
    * document (a proxy for "is running prose at all").
    */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def wordsOf(textCol: Column): Column =
    split(trim(textCol), TextFunctions.WS + "+")

  /** Per-document Gopher signals; one row per input row. */
  def signals(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ws = wordsOf(col(textCol))
    val nWords = greatest(size(ws), lit(1)).cast("double")
    val lines = split(col(textCol), "\n", -1)
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val stopHits = RequiredStopwords.map { sw =>
      when(regexp_like(lower(col(textCol)), lit(s"\\b$sw\\b")), 1).otherwise(0): Column
    }.reduce(_ + _)
    docs.select(
      col(idCol),
      size(ws).cast("long").as("n_words"),
      round(
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / nWords,
        6).as("mean_word_len"),
      round(
        size(filter(ws, w => regexp_like(w, lit("[A-Za-z]")))).cast("double") / nWords,
        6).as("alpha_word_frac"),
      round({
        // occurrence counts by length-delta under literal replace \u2014 the
        // one counting form both engines compute identically; '...' is
        // first canonicalized to a single '\u2026' so it counts once
        val canon = regexp_replace(col(textCol), lit("\\.\\.\\."), lit("\u2026"))
        ((length(col(textCol)) - length(replace(col(textCol), lit("#"), lit(""))) +
          (length(canon) - length(replace(canon, lit("\u2026"), lit(""))))
          ).cast("double") / nWords)
      }, 6).as("symbol_word_ratio"),
      round(
        size(filter(lines, l => regexp_like(l, lit("^[ \\t]*[-*\u2022]"))))
          .cast("double") / nLines,
        6).as("bullet_line_frac"),
      round(
        size(filter(lines, l => regexp_like(l, lit("(\\.\\.\\.|\u2026)[ \\t]*$"))))
          .cast("double") / nLines,
        6).as("ellipsis_line_frac"),
      stopHits.cast("long").as("stopword_hits"))
  }

  /** Gate thresholds, defaulting to the published Gopher rules. */
  final case class Gates(
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaWordFrac: Double = 0.8,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minStopwordHits: Int = 2)

  /** Signals plus (reason, kept) — first failing gate in fixed order
    * (the [[FilterPipeline]] contract): word_len, non_alpha, symbols,
    * bullets, ellipses, stopwords — or 'kept'.
    */
  def decide(docs: DataFrame, gates: Gates = Gates(),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val reason: Column =
      when(col("mean_word_len") < gates.minMeanWordLen ||
        col("mean_word_len") > gates.maxMeanWordLen, "word_len")
        .when(col("alpha_word_frac") < gates.minAlphaWordFrac, "non_alpha")
        .when(col("symbol_word_ratio") > gates.maxSymbolWordRatio, "symbols")
        .when(col("bullet_line_frac") > gates.maxBulletLineFrac, "bullets")
        .when(col("ellipsis_line_frac") > gates.maxEllipsisLineFrac, "ellipses")
        .when(col("stopword_hits") < gates.minStopwordHits, "few_stopwords")
        .otherwise("kept")
    signals(docs, idCol, textCol)
      .withColumn("reason", reason)
      .withColumn("kept", col("reason") === "kept")
  }
}
