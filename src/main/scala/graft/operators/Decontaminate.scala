package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the n-gram-overlap pass every serious
  * training-data pipeline runs before training: any document sharing
  * long word n-grams with an evaluation set is flagged (and usually
  * dropped), so benchmark answers don't leak into the training corpus.
  * The standard recipe (GPT-3 appendix C and successors) uses 8–13-gram
  * overlap; `n` is a parameter here.
  *
  * Shapes at scale: the n-gram relation is `explode` over a
  * codegen'd `transform(sequence(...))` (no per-row UDF), deduplicated
  * per document; the overlap check is a single equi-join on the gram
  * string against the DISTINCT eval-gram set — linear in corpus grams
  * plus true collisions, never all-pairs. Eval sets (benchmarks) are
  * tiny relative to a training corpus, so Spark's broadcast threshold /
  * AQE turns the join into a map-side hash probe.
  */
object Decontaminate {

  /** Distinct word `n`-grams per document: (idCol, g). Documents with
    * fewer than `n` words contribute nothing. Tokenization is the
    * engine-wide whitespace split ([[TextFunctions.WS]]).
    */
  def grams(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val l = col("__l")
    docs.select(col(idCol), split(trim(col(textCol)), TextFunctions.WS + "+").as("__l"))
      .filter(size(l) >= n)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(l) - (n - 1)),
          i => concat_ws(" ", slice(l, i, lit(n))))).as("g"))
      .distinct()
  }

  /** Per-train-document contamination profile against `eval`:
    * (idCol, n_grams, n_overlap, overlap_frac, contaminated) where
    * `n_grams` counts the document's distinct n-grams, `n_overlap` those
    * that occur anywhere in the eval set, and `contaminated` is
    * `overlap_frac > threshold`. Train documents shorter than `n` words
    * are absent (no gram evidence either way).
    */
  def overlap(train: DataFrame, eval: DataFrame, n: Int = 8,
      threshold: Double = 0.05,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val evalGrams = grams(eval, n, idCol, textCol)
      .select(col("g")).distinct().withColumn("__hit", lit(1))
    val frac: Column = col("n_overlap").cast("double") / col("n_grams")
    grams(train, n, idCol, textCol)
      .join(evalGrams, Seq("g"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_overlap"))
      .select(col(idCol), col("n_grams"), col("n_overlap"),
        frac.as("overlap_frac"), (frac > threshold).as("contaminated"))
  }
}
