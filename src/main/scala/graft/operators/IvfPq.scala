package graft.operators

import graft.functions.PqAdc
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF×PQ composition — the classical IVFADC index (Jégou et al., TPAMI
  * 2011, §V): [[IvfAnn]] contributes the COARSE level (only `nprobe` of
  * `k_ivf` centroid cells are visited per query), [[PqAnn]] the FINE
  * level (rows inside a visited cell are scored by ADC table lookups over
  * ~8×-compressed codes, never by reconstructing vectors). Both levers at
  * once: the scan volume drops by `nprobe/k_ivf` AND the bytes per
  * scanned row drop by the PQ compression — and unlike flat-PQ's
  * broadcast scan, the cell restriction makes the scoring join an
  * EQUI-JOIN on `cid`, the partitionable 100 TB shape.
  *
  * An exact re-rank of the k·refine shortlist (bounded equi-joins)
  * recovers the fine-quantization loss exactly as in
  * [[PqAnn.topKRefined]]; the coarse loss (a true neighbor living in an
  * unprobed cell) is bounded by the IVF recall at the chosen `nprobe`.
  *
  * Artifact = centroids + codebooks + the encoded corpus
  * (vec_id, cid, codes, vnorm), content-fingerprint-keyed like its two
  * parents.
  */
object IvfPq {

  final case class Model(ivf: IvfAnn.Model, pq: PqAnn.Model)

  /** One compact row per corpus vector: (vec_id, cid, codes, vnorm). */
  def encode(corpus: DataFrame, mo: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val cids = IvfAnn.withNearestCid(spark,
        corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__vd")),
        mo.ivf, "vec_id", "__vd")
      .select(col("vec_id"), col("cid"))
    PqAnn.encode(corpus, mo.pq, idCol, vecCol).join(cids, "vec_id")
  }

  /** Approximate top-k: probe `nprobe` cells, ADC-score their codes
    * (equi-join on cid), exact-re-rank the k·refine shortlist. Output:
    * (vec_id, neighbor_id, cos, rn).
    */
  def topK(encoded: DataFrame, corpus: DataFrame, queries: DataFrame, mo: Model,
      k: Int = 5, nprobe: Int = 4, refine: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = encoded.sparkSession
    val probes = IvfAnn.withProbeCids(spark,
        queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("__vd")),
        mo.ivf, nprobe, "q_id", "__vd")
      .select(col("q_id"), col("cid"))
    val qSide = probes.join(
      PqAnn.withLut(spark, queries, mo.pq, idCol, vecCol), "q_id")
    val short = encoded
      .join(broadcast(qSide), Seq("cid"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc",
        PqAdc.score(col("codes"), col("lut"), mo.pq.k) / (col("q_norm") * col("vnorm")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("__rn") <= k * refine)
      .select(col("q_id"), col("vec_id").as("c_id"))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", fnorm(col("c_vec")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", fnorm(col("q_vec")))
    c.join(broadcast(short), Seq("c_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cos", fdot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("c_id").as("neighbor_id"), col("cos"), col("rn"))
  }

  /** Persist centroids + codebooks + encoded corpus under one
    * fingerprint-stamped root (stamp written LAST — commit marker).
    */
  def save(spark: SparkSession, mo: Model, encoded: DataFrame, path: String): Unit = {
    IvfAnn.save(spark, mo.ivf, s"$path/centroids")
    import spark.implicits._
    mo.pq.codebooks.toSeq.toDF("block", "cid", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    encoded.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Load a persisted artifact: (model, encoded corpus reader). */
  def load(spark: SparkSession, path: String): (Model, DataFrame) = {
    val ivf = IvfAnn.load(spark, s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    val pq = PqAnn.Model(cb.map(_._1).max + 1, cb.map(_._2).max + 1,
      cb.head._3.length, cb)
    (Model(ivf, pq), spark.read.parquet(s"$path/codes"))
  }

  /** Train both levels + encode once per corpus version, then reuse
    * (the shared content-fingerprint staleness scheme; `version` for
    * zero-scan pinning of immutable corpora).
    */
  def buildOrLoad(spark: SparkSession, corpus: DataFrame, path: String,
      kIvf: Int = 16, ivfIters: Int = 2,
      m: Int = 16, kPq: Int = 32, pqIters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      version: Option[String] = None): (Model, DataFrame) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = version.map(v => s"v:$v").getOrElse {
      val fp = IvfAnn.fingerprint(corpus, idCol, vecCol); s"ivfpq:${fp._1},${fp._2}"
    }
    if (fs.exists(p) && IvfAnn.readStamp(fs, path).contains(stamp)) load(spark, path)
    else {
      val mo = Model(
        IvfAnn.train(corpus, kIvf, ivfIters, idCol, vecCol),
        PqAnn.train(corpus, m, kPq, pqIters, idCol, vecCol))
      save(spark, mo, encode(corpus, mo, idCol, vecCol), path)
      IvfAnn.writeStamp(fs, path, stamp)
      (mo, spark.read.parquet(s"$path/codes"))
    }
  }
}
