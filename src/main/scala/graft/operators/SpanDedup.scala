package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicated-span detection between documents — the distributed
  * form of suffix-array substring dedup (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"): find every maximal
  * verbatim run of at least `minLen` characters shared by two documents,
  * with its position in both.
  *
  * Where near-dup dedup ([[graft.queries.Dedup]] / [[MinHashDedup]])
  * asks "are these documents mostly the same?", span dedup asks "do
  * these documents share a long verbatim passage?" — the signal that
  * catches quoted boilerplate, license blocks, and templated intros
  * pasted into otherwise-unrelated documents.
  *
  * Algorithm (all relational, no suffix array needed): a shared run of
  * L ≥ k characters is exactly a run of L−k+1 consecutive matching
  * k-grams lying on one diagonal (posA − posB constant). So:
  *
  *   1. explode each document into its k-character grams with positions
  *      (one row per position — the dense gram relation);
  *   2. self-equi-join on the gram STRING (not a hash — exactness is the
  *      point of this operator) with `doc_a < doc_b`;
  *   3. group matches by (doc_a, doc_b, diagonal) and split each group
  *      into maximal consecutive islands with the classic
  *      `pos − row_number()` trick;
  *   4. an island of n grams is a shared span of n+k−1 characters; keep
  *      those ≥ `minLen`.
  *
  * Scale shape: the gram relation is ~k× the corpus bytes but never
  * collected — it is one shuffle by gram. The join output is sized by
  * TRUE matches (random text shares no 16-char gram), and pathologically
  * common grams (boilerplate) are hot keys that ride AQE skew splitting.
  * At 100 TB the dense self-join is the verify tier, not the candidate
  * tier: run [[graft.functions.TextFunctions.winnow]] fingerprints first
  * to get candidate pairs (guaranteed to surface any span ≥ w+k−1), then
  * apply this diagonal-run verify restricted to those pairs —
  * `spansAmong` is exactly that restricted form.
  *
  * Reference analogue: file-level content verification
  * (`CommonUtils.java:99-124` compares name+length manifests); this is
  * the row/substring-level generalization.
  */
object SpanDedup {

  /** Dense k-gram relation: (id, p, gram) — 1-based position, full-width
    * grams only (a document shorter than k contributes nothing; it cannot
    * contain a span of length ≥ k).
    */
  def grams(docs: DataFrame, k: Int, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        posexplode(expr(
          s"transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)), i -> substring($textCol, i, $k))")))
      .select(col("id"), (col("pos") + 1).cast("long").as("p"), col("col").as("gram"))
      .filter(length(col("gram")) === k)

  /** All maximal shared spans of ≥ `minLen` characters between distinct
    * documents: (doc_a, doc_b, diag, a_start, b_start, span_chars).
    * Positions are 1-based character offsets; `diag = a_start − b_start`
    * identifies the alignment, so two documents sharing several distinct
    * passages (or the same passage at several offsets) yield one row per
    * maximal run.
    */
  def spans(docs: DataFrame, k: Int = 16, minLen: Int = 40,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minLen >= k, s"minLen ($minLen) must be >= k ($k): shorter spans carry no full gram")
    val g = grams(docs, k, idCol, textCol)
    spanRuns(g, g, k, minLen)
  }

  /** The verify tier for a candidate-pair prefilter: spans only among
    * the given (doc_a, doc_b) pairs (doc_a < doc_b; other rows are
    * ignored). Every join is keyed per PAIR — expand each pair by the
    * left doc's grams, then match the right doc's grams on
    * (doc_b, gram) — so cost is Σ_pairs |grams(doc_a)| plus true
    * matches, sized by the candidate volume, never a corpus-wide gram
    * self-join (the dense [[spans]] form; that one's hot gram keys grow
    * quadratically with corpus size).
    */
  def spansAmong(docs: DataFrame, pairs: DataFrame, k: Int = 16, minLen: Int = 40,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minLen >= k, s"minLen ($minLen) must be >= k ($k)")
    val pr = pairs.select("doc_a", "doc_b")
      .filter(col("doc_a") < col("doc_b")).distinct()
    val aIds = pr.select(col("doc_a").as(idCol)).distinct()
    val bIds = pr.select(col("doc_b").as(idCol)).distinct()
    val ga = grams(docs.join(aIds, idCol), k, idCol, textCol)
      .toDF("doc_a", "pa", "gram")
    val gb = grams(docs.join(bIds, idCol), k, idCol, textCol)
      .toDF("doc_b", "pb", "gram")
    val m = pr.join(ga, Seq("doc_a"))
      .join(gb, Seq("doc_b", "gram"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    islands(m, k, minLen)
  }

  private def spanRuns(ga: DataFrame, gb: DataFrame, k: Int, minLen: Int): DataFrame = {
    val a = ga.toDF("doc_a", "pa", "gram")
    val b = gb.toDF("doc_b", "pb", "gram")
    val m = a.join(b, Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    islands(m, k, minLen)
  }

  /** Maximal-run grouping of a gram-match relation
    * (doc_a, doc_b, pa, pb, diag): consecutive positions on one diagonal
    * collapse to one span row via the pos − row_number() island trick.
    */
  private def islands(m: DataFrame, k: Int, minLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    m.withColumn("island", col("pa") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "island")
      .agg(
        min(col("pa")).as("a_start"),
        min(col("pb")).as("b_start"),
        (max(col("pa")) - min(col("pa")) + k).as("span_chars"))
      .filter(col("span_chars") >= minLen)
      .select("doc_a", "doc_b", "diag", "a_start", "b_start", "span_chars")
  }
}
