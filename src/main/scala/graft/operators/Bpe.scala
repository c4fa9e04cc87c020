package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING at corpus scale (Sennrich et
  * al. 2016) — the step that turns a raw corpus into the merge table a
  * tokenizer ships with.
  *
  * The scale split is the point: BPE's cost model is two very different
  * regimes, and the engine assigns each to the right place.
  *
  *  1. The corpus scan — unbounded, distributed: one pass builds the
  *     word HISTOGRAM (distinct word, count), reduced map-side; the
  *     distributed TopK (`orderBy.limit`, the [[Vocabulary.build]]
  *     shape) caps it at `maxWords` entries covering the frequency mass.
  *  2. The merge loop — bounded, driver-side: greedy pair-merging over
  *     the capped histogram, exactly the [[IvfAnn]] centroid pattern
  *     (driver state bounded by construction, here maxWords rows). A
  *     per-round Spark job would pay scheduler latency × numMerges for
  *     data that fits in one task; training ON the histogram (never the
  *     corpus) is also what reference tokenizer trainers do.
  *
  * Determinism: merge choice ties break by (count desc, pair asc) —
  * the reproducible-retrain ordering; word splits are character-level
  * (no end-of-word sentinel — subword merges never cross words because
  * merging happens inside the per-word symbol arrays).
  */
object Bpe {

  /** One learned merge: `rank`-th merge joins (left, right) which
    * co-occurred `count` times (histogram-weighted) when chosen.
    */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Distributed word histogram capped at the `maxWords` most frequent
    * words: (word, cnt).
    */
  def wordHistogram(docs: DataFrame, maxWords: Int,
      textCol: String = "text"): DataFrame =
    docs.select(explode(split(trim(col(textCol)), TextFunctions.WS + "+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)

  /** Greedy merge loop over a (word, count) histogram — pure driver
    * compute, deterministic. Exposed for spec-level hand checks.
    */
  private[operators] def trainOnHistogram(hist: Seq[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    // mutable word table: symbol arrays + counts
    var words: Array[(Array[String], Long)] =
      hist.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    while (rank < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      val ((l, r), c) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
      merges += Merge(rank + 1, l, r, c)
      words = words.map { case (syms, cnt) => (mergeOnce(syms, l, r), cnt) }
      rank += 1
    }
    merges.result()
  }

  /** One greedy left-to-right, non-overlapping application of a single
    * merge to a symbol array.
    */
  private def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { s =>
      if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
      else out += s
    }
    out.toArray
  }

  /** Segment one word under an ordered merge list — the application-side
    * primitive (build a word→subwords cache for the histogram head, the
    * standard fast-tokenizer layout; rare tail words segment on demand).
    */
  def applyMerges(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(word.split("").filter(_.nonEmpty)) { (syms, m) =>
      mergeOnce(syms, m.left, m.right)
    }.toSeq

  /** Train `numMerges` merges from a corpus: distributed histogram,
    * driver-side merge loop.
    */
  def train(docs: DataFrame, numMerges: Int, maxWords: Int = 100000,
      textCol: String = "text"): Seq[Merge] =
    trainOnHistogram(
      wordHistogram(docs, maxWords, textCol).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq,
      numMerges)

  /** [[train]] as a DataFrame: (rank, left, right, merged, count). */
  def trainDf(spark: SparkSession, docs: DataFrame, numMerges: Int,
      maxWords: Int = 100000, textCol: String = "text"): DataFrame = {
    import spark.implicits._
    train(docs, numMerges, maxWords, textCol)
      .map(m => (m.rank.toLong, m.left, m.right, m.left + m.right, m.count))
      .toDF("rank", "left", "right", "merged", "count")
  }
}
