package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition analysis for quality filtering (the Gopher/C4 repetition
  * gates): highly repetitive documents — boilerplate, scraped menus,
  * degenerate generation loops — are the single biggest junk class in web
  * training data, and the standard filters gate on (a) the duplicate-word
  * fraction and (b) the share of n-grams claimed by the single most
  * frequent n-gram.
  *
  * (a) is a per-row column function ([[TextFunctions.dupWordFraction]]);
  * (b) needs a per-document mode, computed here the distributed way:
  * explode words once, form n-grams with a `lead` window (one shuffle by
  * doc), count per (doc, gram) with map-side partial aggregation, reduce
  * to per-doc (top count, total). Linear in corpus tokens, no per-row
  * quadratic array work — the shape that survives 100 TB.
  */
object Repetition {

  /** Per-document n-gram concentration: (idCol, top_cnt, n_grams) where
    * `top_cnt` is the count of the most frequent word n-gram and
    * `n_grams` the total n-gram count. Documents with fewer than n words
    * are absent (join and coalesce to zero downstream). Ties on count
    * don't matter: only the max count is exposed, not the gram.
    */
  def ngramStats(docs: DataFrame, n: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    val words = docs
      .select(col(idCol), posexplode(split(trim(col(textCol)), TextFunctions.WS + "+")))
      .toDF(idCol, "pos", "w")
    val wOrd = Window.partitionBy(idCol).orderBy("pos")
    val withNext = (1 until n).foldLeft(words) { case (df, i) =>
      df.withColumn(s"w$i", lead(col("w"), i).over(wOrd))
    }
    val gram = concat_ws(" ", (col("w") +: (1 until n).map(i => col(s"w$i"))): _*)
    withNext
      .filter((1 until n).map(i => col(s"w$i").isNotNull).foldLeft(lit(true))(_ && _))
      .select(col(idCol), gram.as("ng"))
      .groupBy(idCol, "ng").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol)
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("n_grams"))
  }

  /** The composite repetition profile: (idCol, dup_word_frac,
    * top_ngram_frac) for every document (zero for docs too short to form
    * an n-gram).
    */
  def profile(docs: DataFrame, n: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        TextFunctions.dupWordFraction(col(textCol)).as("dup_word_frac"))
      .join(ngramStats(docs, n, idCol, textCol), Seq(idCol), "left")
      .select(col(idCol), col("dup_word_frac"),
        coalesce(col("top_cnt").cast("double") / col("n_grams"), lit(0.0))
          .as("top_ngram_frac"))
}
