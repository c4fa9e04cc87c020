package graft.operators

import graft.functions.{PqAdc, VectorFunctions}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization (PQ) approximate nearest neighbor — the MEMORY
  * scale lever beyond int8 (SURVEY §2.6 extension tier; Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * The d-dim embedding is split into `m` subvectors of d/m dims; each
  * subvector is vector-quantized against its own k-centroid codebook
  * (plain L2 Lloyd's, trained per block, all DataFrame ops). A corpus row
  * then stores only `m` small codes + its exact norm — at d=64 floats,
  * m=8/k=32 that is 256 → ~16 bytes per vector through scan, shuffle and
  * broadcast (16×; int8 quantization stops at 4×).
  *
  * Search is ASYMMETRIC distance computation (ADC): the query stays full
  * precision; one m·k lookup table of (query subvector · centroid) dots
  * is built per query against the broadcast codebook, and every corpus
  * row is scored by `m` table lookups ([[graft.functions.PqAdc]],
  * codegen'd) — never by reconstructing vectors. Approximate cosine =
  * ADC dot / (‖q‖ · stored exact ‖x‖).
  *
  * Artifact shape mirrors [[IvfAnn]]: codebooks + encoded corpus persist
  * once per corpus version (fingerprint-stamped, content-keyed); the
  * query path reads ONLY the compact codes table.
  */
object PqAnn {

  /** Per-block codebooks: (block, cid, centroid) with `m` blocks ×
    * `k` centroids of `dsub` dims — m·k rows, safe to broadcast.
    */
  final case class Model(m: Int, k: Int, dsub: Int,
      codebooks: Array[(Int, Int, Seq[Double])])

  private def cbDf(spark: SparkSession, mo: Model): DataFrame = {
    import spark.implicits._
    mo.codebooks.toSeq.toDF("__block", "__cid", "__c")
  }

  /** (id, block, subvector) fan-out of a vector column — the unit every
    * training/encoding job works in.
    */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int): DataFrame = {
    val slices = (0 until m).map(b => slice(asDouble(col(vecCol)), b * dsub + 1, dsub))
    df.select(col(idCol).as("id"), posexplode(array(slices: _*)))
      .toDF("id", "block", "sub")
  }

  /** (id, block, cid) nearest-centroid assignment for exploded
    * subvectors: broadcast-join with the m·k codebook table, then one
    * map-side-partial min-struct reduction — argmin ‖x−c‖² via the
    * expansion ‖c‖²−2x·c (‖x‖² is constant per row). Ties break to the
    * smallest cid.
    */
  private def assign(spark: SparkSession, sub: DataFrame, mo: Model): DataFrame =
    sub.join(broadcast(
        cbDf(spark, mo).withColumn("__cn", fdot(col("__c"), col("__c")))),
        col("block") === col("__block"))
      .withColumn("__d", col("__cn") - lit(2.0) * fdot(col("sub"), col("__c")))
      .groupBy("id", "block")
      .agg(min(struct(col("__d"), col("__cid"))).getField("__cid").as("cid"))

  /** Deterministic per-block Lloyd's: init = the k hash-ranked corpus
    * rows' subvectors (all blocks share the picked rows), `iters` rounds
    * of assign + per-(block, cid) mean. A cluster that loses every row
    * keeps its previous centroid. Training can run on a `trainFraction`
    * hash-sample of the corpus (codebooks are distributional — the norm
    * at 100 TB, where training on the full table buys nothing).
    */
  def train(corpus: DataFrame, m: Int = 8, k: Int = 32, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainFraction: Double = 1.0): Model = {
    val spark = corpus.sparkSession
    val d = corpus.select(size(col(vecCol))).head(1).headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("cannot train PQ on an empty corpus"))
    require(d % m == 0, s"embedding dim $d must divide into m=$m blocks")
    require(k <= 32767, "codes are stored as smallint")
    val dsub = d / m
    val base =
      if (trainFraction >= 1.0) corpus
      else corpus.filter(pmod(xxhash64(col(idCol)), lit(1000000)) <
        lit((trainFraction * 1000000).toLong))
    val sub = subvectors(base, idCol, vecCol, m, dsub).localCheckpoint()

    // init: subvectors of the k deterministic hash-ranked rows; cid =
    // hash rank. k×m values — driver-bounded by construction. A corpus
    // (or sample) smaller than k caps the codebook at its row count —
    // Model.k must equal the REAL centroid count, or every downstream
    // LUT is m·k_claimed long while codes address m·k_actual and PqAdc's
    // shape check nulls every score.
    val initIds = base.select(col(idCol).as("id"))
      .withColumn("h", xxhash64(col("id"))).orderBy(col("h"), col("id")).limit(k)
      .select("id").collect().map(_.get(0))
    val kActual = initIds.length
    val rank = initIds.zipWithIndex.toMap
    var mo = Model(m, kActual, dsub,
      sub.filter(col("id").isInCollection(initIds))
        .collect()
        .map(r => (r.getInt(1), rank(r.get(0)), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)))

    (0 until iters).foreach { _ =>
      val updated = assign(spark, sub, mo)
        .join(sub, Seq("id", "block"))
        .select(col("block"), col("cid"), posexplode(col("sub")))
        .groupBy("block", "cid", "pos").agg(avg(col("col")).as("mv"))
        .groupBy("block", "cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          s => s.getField("mv")).as("c"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2)))
        .toMap
      mo = mo.copy(codebooks = mo.codebooks.map { case (b, c, old) =>
        (b, c, updated.getOrElse((b, c), old))
      })
    }
    mo
  }

  /** Encode the corpus under a model: (id, codes array<smallint>[m],
    * vnorm) — the compact search representation. `vnorm` is the EXACT
    * norm of the original vector, so cosine denominators carry no
    * quantization error.
    */
  def encode(corpus: DataFrame, mo: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val sub = subvectors(corpus, idCol, vecCol, mo.m, mo.dsub)
    val codes = assign(spark, sub, mo)
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("block"), col("cid")))),
        s => s.getField("cid").cast("smallint")).as("codes"))
    corpus.select(col(idCol).as("id"), fnorm(col(vecCol)).as("vnorm"))
      .join(codes, "id")
      .select(col("id").as("vec_id"), col("codes"), col("vnorm"))
  }

  /** Per-query flat LUT (m·k doubles, `lut[b*k+c]` = query-subvector-b ·
    * centroid c of block b) against the broadcast codebook — queries are
    * the bounded side, so the collect_list window stays cheap.
    */
  private[operators] def withLut(spark: SparkSession, queries: DataFrame, mo: Model,
      idCol: String, vecCol: String): DataFrame = {
    val lut = subvectors(queries, idCol, vecCol, mo.m, mo.dsub)
      .join(broadcast(cbDf(spark, mo)), col("block") === col("__block"))
      .withColumn("__d", fdot(col("sub"), col("__c")))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("block"), col("__cid"), col("__d")))),
        s => s.getField("__d")).as("lut"))
    queries.select(col(idCol).as("q_id"), fnorm(col(vecCol)).as("q_norm"))
      .join(lut, col("q_id") === col("id")).drop("id")
  }

  /** Approximate top-k by ADC over an ENCODED corpus ([[encode]] output —
    * only codes + norms are scanned; the float embeddings never load).
    * Output: (vec_id, neighbor_id, cos, rn) like the exact path.
    */
  def topK(encoded: DataFrame, queries: DataFrame, mo: Model, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = encoded.sparkSession
    val q = withLut(spark, queries, mo, idCol, vecCol)
    encoded.select(col("vec_id").as("c_id"), col("codes"), col("vnorm"))
      .join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos",
        PqAdc.score(col("codes"), col("lut"), mo.k) / (col("q_norm") * col("vnorm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("c_id").as("neighbor_id"), col("cos"), col("rn"))
  }

  /** ADC + exact re-rank (the "+R" stage of Jégou et al.): ADC shortlists
    * `k·refine` candidates per query from the COMPRESSED corpus, then only
    * the shortlist's full vectors are fetched (one broadcast semi-join
    * against the corpus scan — the shortlist is |queries|·k·refine rows,
    * bounded) and re-scored exactly. On the near-random sf fixtures this
    * lifts recall@5 from 0.48 (raw ADC, m=16/k=32) to 0.98 at refine=10 —
    * the full-precision table is touched for ~k·refine rows per query
    * instead of |corpus|, which is the entire point at 100 TB.
    */
  def topKRefined(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      mo: Model, k: Int = 5, refine: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val short = topK(encoded, queries, mo, k * refine)
      .select(col("vec_id").as("q_id"), col("neighbor_id").as("c_id"))
    rerankExact(short, corpus, queries, k, idCol, vecCol)
  }

  /** Exact re-rank of a bounded (q_id, c_id) shortlist against the
    * full-precision corpus — shared by the PQ and OPQ "+R" stages.
    */
  private[operators] def rerankExact(short: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", fnorm(col("c_vec")))
    val qq = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", fnorm(col("q_vec")))
    c.join(broadcast(short), Seq("c_id"))
      .join(broadcast(qq), Seq("q_id"))
      .withColumn("cos", fdot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("c_id").as("neighbor_id"), col("cos"), col("rn"))
  }

  /** Persist model + encoded corpus as one artifact:
    * `path/codebooks` (m·k rows), `path/codes` (|corpus| compact rows),
    * `path/_fingerprint` (corpus content stamp, written LAST as the
    * commit marker — a crashed build never validates).
    */
  def save(spark: SparkSession, mo: Model, encoded: DataFrame, path: String): Unit = {
    import spark.implicits._
    mo.codebooks.toSeq.toDF("block", "cid", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    encoded.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Load a persisted artifact: (model, encoded corpus reader). */
  def load(spark: SparkSession, path: String): (Model, DataFrame) = {
    val cb = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    val m = cb.map(_._1).max + 1
    val k = cb.map(_._2).max + 1
    (Model(m, k, cb.head._3.length, cb), spark.read.parquet(s"$path/codes"))
  }

  /** Train + encode once per corpus version, then reuse ([[IvfAnn]]'s
    * content-keyed staleness scheme: pass `version` for explicitly
    * versioned corpora and pay zero staleness scans, else one
    * column-pruned fingerprint pass guards reuse).
    */
  def buildOrLoad(spark: SparkSession, corpus: DataFrame, path: String,
      m: Int = 8, k: Int = 32, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainFraction: Double = 1.0,
      version: Option[String] = None): (Model, DataFrame) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = version.map(v => s"v:$v").getOrElse {
      val fp = IvfAnn.fingerprint(corpus, idCol, vecCol); s"pq:${fp._1},${fp._2}"
    }
    if (fs.exists(p) && IvfAnn.readStamp(fs, path).contains(stamp)) load(spark, path)
    else {
      val mo = train(corpus, m, k, iters, idCol, vecCol, trainFraction)
      save(spark, mo, encode(corpus, mo, idCol, vecCol), path)
      IvfAnn.writeStamp(fs, path, stamp)
      (mo, spark.read.parquet(s"$path/codes"))
    }
  }
}
