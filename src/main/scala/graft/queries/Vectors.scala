package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search tier over `embeddings` (SURVEY.md §2.6 extension
  * table). The oracle-checked queries output neighbor IDs and ranks, not
  * cosine values: DuckDB's `list_cosine_similarity` computes in float32
  * (~1e-7 error vs our double math), while adjacent-rank margins in the
  * fixture are ≥ 1.9e-5 — so ranks agree exactly but the raw scores would
  * be flaky to hash. The near-dup threshold 0.46 sits in a ≥ 4e-3 wide
  * gap of the pair-cosine distribution at both sf0.001 and sf0.01.
  */
object Vectors {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Embedding dimension of a fixture dir, probed once per session+dir and
    * passed to every LSH/near-dup call — the operators accept `dim` so the
    * probe job doesn't run inside each query plan.
    */
  private val dimCache = new graft.SessionCache[Int]
  private def embDim(s: SparkSession, dir: String): Int =
    dimCache.getOrCompute(s, dir)(
      t(s, dir, "embeddings").select(size(col("embedding"))).head().getInt(0))

  /** Exact brute-force top-5 neighbor sets for the standard query slice
    * (vec_id < 100) — the ground truth every approximate query measures
    * itself against. Computed once per session+dir (driver-bounded: 100
    * queries × 5 neighbors) and broadcast back.
    */
  private val exactCache = new graft.SessionCache[Seq[(Long, Seq[Long])]]
  private def exactTop5(s: SparkSession, dir: String): Seq[(Long, Seq[Long])] =
    exactCache.getOrCompute(s, dir) {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 100), k = 5)
        .select(col("vec_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (v, ns) => (v, ns.map(_._2).toSeq) }.toSeq
    }

  /** Self-evidencing ANN output: append per-query `recall` (|approx ∩
    * exact top-5| / 5) so the artifact itself carries the accuracy claim
    * the recall-floor specs pin — an operator reading the result sees
    * how approximate it is without consulting the test suite. The
    * ground-truth join is a 100-row broadcast; the per-vec_id window
    * runs over ≤ k rows per partition key.
    */
  private def withRecall(s: SparkSession, dir: String, approx: DataFrame): DataFrame = {
    import s.implicits._
    val exactDf = exactTop5(s, dir).toDF("vec_id", "__exact")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
    approx.join(broadcast(exactDf), Seq("vec_id"), "left")
      .withColumn("recall",
        size(array_intersect(collect_set(col("neighbor_id")).over(w), col("__exact")))
          / size(col("__exact")))
      .drop("__exact")
  }

  val entries: Seq[QueryDef] = Seq(

    // exact cosine top-5 for the first 100 vectors (queries broadcast,
    // corpus streamed — scales with |corpus|)
    QueryDef.checked(
      "q36_ann_topk",
      """WITH p AS (
        |  SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding, c.embedding) AS cos
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 100 AND c.vec_id != q.vec_id),
        |r AS (
        |  SELECT vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT vec_id, neighbor_id, rn FROM r WHERE rn <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 100), k = 5)
        .select(col("vec_id"), col("neighbor_id"), col("rn"))
    },

    // cosine near-dup at a distribution-gap-safe threshold — LSH-banded
    // candidates + exact verification (NO all-pairs join in the plan; the
    // oracle is the exact all-pairs form, which the bucketed path matches
    // because its banding finds every qualifying fixture pair — asserted
    // against the exact operator in DedupSimilaritySpec).
    // COUPLING NOTE: LSH recall is probabilistic (~3e-4 per-pair miss at
    // cos 0.46 under 160×7, seed 42); exact oracle equality holds because
    // the seed was validated against the current fixtures. If fixtures are
    // ever regenerated or the threshold moves, re-run DedupSimilaritySpec's
    // banded-equals-exact test FIRST — a miss there is a parameter/fixture
    // problem, not a code bug.
    QueryDef.checked(
      "q37_cosine_neardup",
      """SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.46""".stripMargin) { (s, dir) =>
      Similarity.neardupPairsBucketed(t(s, dir, "embeddings"), threshold = 0.46,
        dim = embDim(s, dir))
    },

    // hyperplane-LSH approximate top-k — the 100 TB path. Geometry is the
    // weak-similarity fixture regime (4 bits × 8 tables) with one extra
    // multi-probe per table (weakest-bit flip): recall 0.868 vs 0.668
    // single-probe at ≤2× candidates — pinned in DedupSimilaritySpec
    // (floor 0.8), not by the oracle. High-similarity corpora keep the
    // 8×6 defaults. The probe fan-out is one native per-row expression
    // (functions/HyperplaneBands.probeKeys): q38 measured 4.4 s when the
    // sequence was built from Column combinators (plan-tree-bound) and
    // 0.67 s native at identical recall.
    QueryDef.rowsOnly("q38_ann_lsh") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      withRecall(s, dir, Similarity.lshTopK(emb, emb.filter(col("vec_id") < 100), k = 5,
        nbits = 4, ntables = 8, dim = embDim(s, dir), probes = 2))
    },

    // int8-quantized top-k — the storage/bandwidth scale lever (4× fewer
    // bytes end-to-end); recall vs full precision pinned in
    // DedupSimilaritySpec, not by the oracle (quantization is
    // engine-specific by nature).
    QueryDef.rowsOnly("q62_ann_quantized") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      withRecall(s, dir,
        Similarity.bruteForceTopKQuantized(emb, emb.filter(col("vec_id") < 100), k = 5))
    },

    // IVF (centroid-partitioned) approximate top-k — the other scale path;
    // recall vs brute force pinned in DedupSimilaritySpec. The model is a
    // persisted train-once artifact: the query path only assigns + probes
    // (training inside every query invocation would re-scan the corpus
    // `iters` times per query — wrong at scale).
    QueryDef.rowsOnly("q54_ann_ivf") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val modelPath =
        s"${sys.props("java.io.tmpdir")}/graft-models/ivf_${dir.replaceAll("[^a-z0-9.]", "_")}"
      val model = graft.operators.IvfAnn.trainOrLoad(s, emb, modelPath, k = 16, iters = 2)
      withRecall(s, dir, graft.operators.IvfAnn.topK(emb, emb.filter(col("vec_id") < 100),
        model, k = 5, nprobe = 4))
    },

    // product-quantized top-k with exact re-rank — the MEMORY scale path
    // (m=16 smallint codes ≈ 8× fewer bytes than float32 at d=64; ADC
    // scans only codes, full vectors load for k·refine rows per query).
    // Raw-ADC and refined recall floors pinned in DedupSimilaritySpec;
    // the model+codes artifact is train-once, content-fingerprint-keyed.
    QueryDef.rowsOnly("q68_ann_pq") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val modelPath =
        s"${sys.props("java.io.tmpdir")}/graft-models/pq_${dir.replaceAll("[^a-z0-9.]", "_")}"
      val (model, encoded) = graft.operators.PqAnn.buildOrLoad(s, emb, modelPath,
        m = 16, k = 32, iters = 4)
      withRecall(s, dir, graft.operators.PqAnn.topKRefined(encoded, emb,
        emb.filter(col("vec_id") < 100), model, k = 5, refine = 10))
    },

    // IVF×PQ (IVFADC) — both scale levers composed: nprobe/k of the corpus
    // scanned, at ~8× fewer bytes per scanned row, through an EQUI-join on
    // the cell id; exact re-rank recovers fine-quantization loss (recall
    // tracks IVF-only at equal nprobe — spec-pinned, with full-probe ≡
    // flat PQ as the degeneracy check).
    QueryDef.rowsOnly("q72_ann_ivfpq") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val modelPath =
        s"${sys.props("java.io.tmpdir")}/graft-models/ivfpq_${dir.replaceAll("[^a-z0-9.]", "_")}"
      val (model, encoded) = graft.operators.IvfPq.buildOrLoad(s, emb, modelPath)
      withRecall(s, dir, graft.operators.IvfPq.topK(encoded, emb,
        emb.filter(col("vec_id") < 100), model, k = 5, nprobe = 4))
    },

    // OPQ — PQ behind a learned orthogonal rotation (Ge et al. 2013):
    // same bytes per vector, lower quantization error when embedding dims
    // are correlated across block boundaries. Rotation trains on a driver
    // sample (Procrustes/SVD), applies as ONE codegen'd MatVec pass; the
    // anisotropic-fixture spec pins OPQ > plain PQ raw-ADC recall.
    // SemDeDup — semantic dedup by embedding: k-means cells (the q54 IVF
    // artifact, shared) block the pair search, in-cell cosine ≥ 0.46 (the
    // q37 gap-safe threshold) marks duplicates, higher id drops. Pair
    // subset/recall vs the exact all-pairs operator and the k=1 degeneracy
    // (≡ neardupPairs) are pinned in DedupSimilaritySpec; the decision
    // table itself has no SQL-expressible oracle (k-means cells).
    QueryDef.rowsOnly("q88_semantic_dedup") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val modelPath =
        s"${sys.props("java.io.tmpdir")}/graft-models/ivf_${dir.replaceAll("[^a-z0-9.]", "_")}"
      val model = graft.operators.IvfAnn.trainOrLoad(s, emb, modelPath, k = 16, iters = 2)
      graft.operators.SemDedup.decisions(emb, model, threshold = 0.46)
    },

    QueryDef.rowsOnly("q84_ann_opq") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val modelPath =
        s"${sys.props("java.io.tmpdir")}/graft-models/opq_${dir.replaceAll("[^a-z0-9.]", "_")}"
      val (model, encoded) = graft.operators.OpqAnn.buildOrLoad(s, emb, modelPath,
        m = 16, k = 32)
      withRecall(s, dir, graft.operators.OpqAnn.topKRefined(encoded, emb,
        emb.filter(col("vec_id") < 100), model, k = 5, refine = 10))
    },

    // SEMANTIC decontamination: the embedding-space complement of q77's
    // n-gram pass — a paraphrased benchmark item shares no 8-gram with
    // its source but its embedding still sits next to it. Eval set =
    // vec_id % 31 = 0 (benchmark-sized, broadcast); every corpus vector
    // gets its nearest eval id and the ≥0.42 contamination flag. The
    // oracle replays the DECISIONS, not the raw cosine (the q36/q37
    // discipline: DuckDB computes float-list cosines, the engine double
    // — values differ at 1e-7, decisions don't: the fixtures' argmax
    // gaps are ≥6.7e-5 and the nearest threshold gap is ≥2.2e-4 at
    // every sf, both orders of magnitude above the arithmetic seam).
    // Corpus-linear: one streamed scan against a broadcast eval side —
    // the same discipline as q36, never |corpus|².
    QueryDef.checked(
      "q173_semantic_decontam",
      """WITH ev AS (SELECT * FROM embeddings WHERE vec_id % 31 = 0),
        |co AS (SELECT * FROM embeddings WHERE vec_id % 31 <> 0),
        |p AS (SELECT co.vec_id, ev.vec_id AS eval_id,
        |        list_cosine_similarity(co.embedding::DOUBLE[],
        |                               ev.embedding::DOUBLE[]) AS cos
        |      FROM co, ev),
        |r AS (SELECT vec_id, eval_id, cos,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY cos DESC, eval_id) AS rn
        |      FROM p)
        |SELECT vec_id, eval_id AS nearest_eval,
        |  CAST(cos >= 0.42 AS BOOLEAN) AS contaminated
        |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      graft.operators.Decontaminate.semanticOverlap(
        emb.filter(col("vec_id") % 31 =!= 0),
        emb.filter(col("vec_id") % 31 === 0), threshold = 0.42)
        .select(col("vec_id"), col("nearest_eval"), col("contaminated"))
    }
  )
}
