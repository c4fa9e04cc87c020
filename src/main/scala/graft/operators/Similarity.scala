package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k for a bounded query set —
  *   corpus-streamed, queries broadcast, so it scales with |corpus|, not
  *   |corpus|² (the correctness baseline).
  * - `neardupPairs`: exact all-pairs threshold join (small corpora /
  *   validation only — quadratic by nature).
  * - `lshTopK`: random-hyperplane LSH bucketing — the 100 TB path: each
  *   of `ntables` tables hashes every vector to an `nbits`-bit bucket;
  *   only same-bucket pairs are scored. Hyperplanes are generated from a
  *   fixed seed, so results are deterministic.
  */
object Similarity {

  private def withNorm(df: DataFrame, idCol: String, vecCol: String, p: String): DataFrame =
    df.select(col(idCol).as(p + "id"), col(vecCol).as(p + "vec"))
      .withColumn(p + "norm", fnorm(col(p + "vec")))

  /** Exact top-k neighbors (cosine) of each query among the corpus.
    * Output: (vec_id, neighbor_id, cos, rn).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "c_")
    val q = withNorm(queries, idCol, vecCol, "q_")
    rank(c.join(broadcast(q), col("q_id") =!= col("c_id")), k)
  }

  private def rank(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("cos", fdot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("c_id").as("neighbor_id"), col("cos"), col("rn"))

  /** Exact pairs with cosine ≥ threshold — all-pairs, O(n²). Validation
    * oracle for [[neardupPairsBucketed]] on small corpora ONLY; never the
    * scale path.
    */
  def neardupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = withNorm(corpus, idCol, vecCol, "a_")
    val b = withNorm(corpus, idCol, vecCol, "b_")
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", fdot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
  }

  /** Embedding near-dup at scale: banded hyperplane-LSH candidates +
    * exact-cosine verification. No pair enumeration ever touches the full
    * corpus square: candidates come from an equi-join on (band, key) — the
    * same shuffle shape as the MinHash dedup path — and only candidates
    * are scored. Identical output to [[neardupPairs]] whenever every
    * ≥-threshold pair collides in at least one band.
    *
    * Recall is the AND-OR amplification 1-(1-p^r)^b with p = 1-θ/π: the
    * defaults (160 bands × 7 bits, seed 42) are sized for thresholds as
    * weak as cos ≈ 0.45 (p ≈ 0.65 → per-pair miss ≈ 2.8e-4) — verified to
    * find EVERY qualifying pair of the sf0.001/0.01/0.1 fixtures, each
    * through ≥4 independent bands (so a borderline sign flip cannot drop a
    * pair). Corpora with genuinely-near duplicates (cos ≥ 0.8) can run far
    * cheaper geometries (e.g. 16×8). Candidate volume is
    * Σ_pairs p_pair^r per band — on near-orthogonal background (p ≈ 0.5)
    * that is n²/2^r per band, so r sets the background suppression and
    * bands buy recall linearly in cost.
    */
  def neardupPairsBucketed(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bands: Int = 160, rowsPerBand: Int = 7, seed: Long = 42L,
      dim: Int = -1): DataFrame = {
    import graft.functions.HyperplaneBands
    val d = dimOrProbe(corpus, vecCol, dim) match {
      case Some(x) => x
      // empty corpus: the exact path returns an empty pair set; the probe
      // path must too, not throw on head() of nothing
      case None => return corpus.select(col(idCol).as("doc_a"), col(idCol).as("doc_b")).limit(0)
    }
    val ps = planes(d, bands * rowsPerBand, seed)
    // (id, band, key) only — vectors are NOT carried through the explode
    // or the candidate join, so the shuffled band index stays narrow
    val keyed = corpus
      .select(col(idCol).as("id"),
        posexplode(HyperplaneBands.bandKeys(col(vecCol), ps, bands, rowsPerBand)))
      .toDF("id", "band", "key")
    val cands = keyed.as("l").join(keyed.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
      .distinct()
    val a = withNorm(corpus, idCol, vecCol, "a_")
    val b = withNorm(corpus, idCol, vecCol, "b_")
    cands.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("cos", fdot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
  }

  /** Top-k over INT8-QUANTIZED embeddings: corpus and queries are
    * max-abs-quantized to `array<tinyint>` (4× fewer bytes through scan,
    * broadcast, and shuffle — at 100 TB the embedding table's byte volume
    * is the bottleneck, not its FLOPs) and ranked by quantized cosine
    * (per-vector scales cancel in cosine). Same output shape as
    * [[bruteForceTopK]]; recall vs full precision is pinned in
    * DedupSimilaritySpec.
    */
  def bruteForceTopKQuantized(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // per-ROW prep: quantize and take the norm once (the norm of the int8
    // array — scales cancel in cosine); only (id, tinyint array, norm)
    // travels through the broadcast, and rank() reuses the same fdot-based
    // scoring as the exact path (VectorDot reads integral arrays natively)
    def prep(df: DataFrame, p: String): DataFrame =
      df.select(col(idCol).as(p + "id"), col(vecCol).as("v"))
        .withColumn(p + "vec", quantize8(col("v"), q8Scale(col("v"))))
        .drop("v")
        .withColumn(p + "norm", fnorm(col(p + "vec")))
    val c = prep(corpus, "c_")
    val q = prep(queries, "q_")
    rank(c.join(broadcast(q), col("q_id") =!= col("c_id")), k)
  }

  /** Deterministic gaussian hyperplanes (fixed seed per table). */
  private[operators] def planes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** `dim` if the caller supplied it, else one bounded driver probe
    * (None on an empty corpus). Callers that know the dimension (or query
    * repeatedly over one corpus) should pass it and skip the probe job.
    */
  private def dimOrProbe(df: DataFrame, vecCol: String, dim: Int): Option[Int] =
    if (dim > 0) Some(dim)
    else df.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0))

  /** Approximate top-k via multi-table hyperplane LSH. Candidates are the
    * union over tables of same-bucket (query, corpus) pairs; exact cosine
    * ranks the candidates. Output: (vec_id, neighbor_id, cos, rn).
    *
    * Each table's bucket is one element of the codegen'd
    * [[graft.functions.HyperplaneBands]] signature (table t = band t,
    * planes seeded 42+t — bit-identical buckets to the historical per-bit
    * `when` chains): the corpus is scanned ONCE and `posexplode` fans each
    * row out to its `ntables` (table, bucket) keys, instead of `ntables`
    * separate scans each dragging 8 VectorDot calls per row through the
    * plan.
    *
    * MULTI-PROBE (`probes` > 1): each QUERY additionally probes the
    * buckets reached by perturbing its weakest sign bits per table — the
    * bits whose hyperplane dot is nearest zero, i.e. the likeliest to
    * disagree with a true neighbor's (Lv et al., VLDB'07). The probing
    * SEQUENCE is all single-bit flips plus the 2-bit flips of the four
    * weakest bits, ordered by total flipped margin |dot_i| (+ |dot_j|) —
    * so probe j is always the j-th most plausible alternative bucket.
    * Near-miss neighbors become candidates without adding tables: recall
    * rises at ≤ `probes`× candidate volume (structural bound: ≤ `probes`
    * buckets per (query, table)) and ZERO extra corpus-side cost — the
    * corpus index is untouched, only the bounded broadcast side fans out.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nbits: Int = 8, ntables: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = -1, probes: Int = 2): DataFrame = {
    import graft.functions.HyperplaneBands
    val pairFlips = {
      val w = math.min(nbits, 4); w * (w - 1) / 2
    }
    require(probes >= 1 && probes <= nbits + pairFlips + 1,
      s"probes: 1 + at most nbits single flips + $pairFlips two-bit flips")
    val d = dimOrProbe(corpus, vecCol, dim) match {
      case Some(x) => x
      case None => return corpus.select(col(idCol).as("vec_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cos"), lit(0L).as("rn")).limit(0)
    }
    val ps: Array[Array[Double]] =
      (0 until ntables).toArray.flatMap(t => planes(d, nbits, seed = 42L + t))
    def keyed(df: DataFrame, p: String): DataFrame =
      df.select(col(p + "id"),
          posexplode(HyperplaneBands.bandKeys(col(p + "vec"), ps, ntables, nbits)))
        .toDF(p + "id", "table", "bucket")
    val c = withNorm(corpus, idCol, vecCol, "c_")
    val q = withNorm(queries, idCol, vecCol, "q_")
    // query-side probe fan-out: per table, the exact bucket plus the
    // margin-ordered bit flips, all computed in ONE native per-row pass
    // ([[HyperplaneBands.probeKeys]]). This used to be built from Column
    // combinators — element_at(array_sort(...), j) per probe, each
    // re-embedding every per-bit dot product — and the q38 shape spent
    // ~4 s/run in analysis + codegen of that multi-thousand-node tree
    // (probes=8 reached 28 s over a 2000-row corpus: cost scaled with
    // the TREE, not the data).
    val qKeyed =
      if (probes == 1) keyed(q, "q_")
      else q.select(col("q_id"),
          posexplode(HyperplaneBands.probeKeys(col("q_vec"), ps, ntables, nbits, probes)))
        .toDF("q_id", "pos", "bucket")
        .select(col("q_id"), (col("pos") / probes).cast("int").as("table"), col("bucket"))
    val cands = keyed(c, "c_").join(broadcast(qKeyed), Seq("table", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
      .distinct()
    val scored = cands
      .join(c, Seq("c_id")).join(broadcast(q), Seq("q_id"))
    rank(scored, k)
  }
}
