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

  /** Pairwise SOURCE-overlap matrix at sketch cost: one theta sketch of
    * word n-grams per source, then every pair's estimated shared-gram
    * count, union size and Jaccard from sketch algebra alone —
    * `(src_a, src_b, est_common, est_union, est_jaccard)` for a < b.
    *
    * The exact form is a gram-relation self-join PER PAIR (k² passes over
    * the corpus, each a heavy shuffle); this form scans grams once,
    * reduces to k kilobyte-sized sketch rows, and crosses those. Gram
    * rows go into the sketch WITHOUT a distinct() — theta sketches are
    * set-semantic by construction (duplicate hashes land in the same
    * slot), so the dedup shuffle that [[grams]] needs for exact counting
    * would be pure waste here; the corpus is exploded and aggregated in
    * one partial-agg pass.
    */
  def sourceOverlap(docs: DataFrame, n: Int = 8,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val l = col("__l")
    val rawGrams = docs
      .select(col(sourceCol), split(trim(col(textCol)), TextFunctions.WS + "+").as("__l"))
      .filter(size(l) >= n)
      .select(col(sourceCol),
        explode(transform(sequence(lit(1), size(l) - (n - 1)),
          i => concat_ws(" ", slice(l, i, lit(n))))).as("g"))
    val sk = rawGrams.groupBy(col(sourceCol)).agg(theta_sketch_agg(col("g")).as("sk"))
    val a = sk.select(col(sourceCol).as("src_a"), col("sk").as("sk_a"))
    val b = sk.select(col(sourceCol).as("src_b"), col("sk").as("sk_b"))
    val common = theta_sketch_estimate(theta_intersection(col("sk_a"), col("sk_b")))
    val union = theta_sketch_estimate(theta_union(col("sk_a"), col("sk_b")))
    a.join(b, col("src_a") < col("src_b")) // k² sketch rows, kilobytes each
      .select(col("src_a"), col("src_b"), common.as("est_common"),
        union.as("est_union"),
        round(common.cast("double") / greatest(union, lit(1L)), 6).as("est_jaccard"))
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram pass: a paraphrased benchmark item shares no 8-gram with its
    * source, but its embedding still sits next to it. Every corpus
    * vector is scored against ALL eval vectors (exact cosine) and
    * flagged when its maximum similarity reaches `threshold`; the
    * nearest eval id travels with the flag so a hit is auditable.
    *
    * Scale shape: eval sets are benchmark-sized (bounded), so the eval
    * side broadcasts and the pass is ONE corpus-linear scan — the same
    * corpus-streamed discipline as [[Similarity.bruteForceTopK]], never
    * |corpus|². Cosines round to 9 places before the max/threshold;
    * cross-engine it is the DECISIONS (argmax + flag) that replay — raw
    * scores carry each engine's accumulation ulps (q36/q37 discipline).
    *
    * Output: (idCol, nearest_eval, max_cos, contaminated).
    */
  def semanticOverlap(corpus: DataFrame, eval: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cvec"))
      .withColumn("__cnorm", fnorm(col("__cvec")))
    val e = eval.select(col(idCol).as("__eid"), col(vecCol).as("__evec"))
      .withColumn("__enorm", fnorm(col("__evec")))
    c.join(broadcast(e))
      .withColumn("__cos",
        round(fdot(col("__cvec"), col("__evec")) / (col("__cnorm") * col("__enorm")), 9))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__cid").orderBy(col("__cos").desc, col("__eid"))))
      .filter(col("__rn") === 1)
      .select(col("__cid").as(idCol), col("__eid").as("nearest_eval"),
        col("__cos").as("max_cos"),
        (col("__cos") >= threshold).as("contaminated"))
  }
}
