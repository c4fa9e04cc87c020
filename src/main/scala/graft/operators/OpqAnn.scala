package graft.operators

import breeze.linalg.{svd, DenseMatrix}
import graft.functions.MatVec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization (OPQ) — PQ behind a LEARNED orthogonal
  * rotation (Ge et al., "Optimized Product Quantization", CVPR 2013,
  * non-parametric variant). Plain PQ quantizes axis-aligned blocks; when
  * embedding dimensions are correlated across block boundaries
  * (anisotropy — the norm for real model embeddings), a rotation that
  * redistributes variance before blocking cuts quantization error at
  * IDENTICAL bytes per vector.
  *
  * Training alternates on a DRIVER-HELD deterministic hash-sample
  * (codebooks and a d×d rotation are distributional — sampling is the
  * 100 TB norm, the sample is bounded by `sampleSize`): (1) per-block
  * Lloyd's on the rotated sample, (2) the orthogonal Procrustes solve
  * min_R ‖R·X − Y‖_F via one d×d SVD (breeze/LAPACK) against the PQ
  * reconstructions Y. The distributed side never changes: corpus rows are
  * rotated by one codegen'd [[graft.functions.MatVec]] pass and then
  * encoded/searched by the unmodified [[PqAnn]] machinery — rotation
  * preserves norms and cosines, so scores stay comparable and the exact
  * re-rank runs on the ORIGINAL vectors.
  */
object OpqAnn {

  /** Learned rotation (d×d, row-major rows) + the PQ model trained in the
    * rotated space.
    */
  final case class Model(rotation: Array[Array[Double]], pq: PqAnn.Model)

  /** The rotated view of a vector column: R·x as array<double>. */
  def rotate(vec: Column, mo: Model): Column = MatVec(vec, mo.rotation)

  // ---- local (driver-side, sample-bounded) training helpers ----

  private def matvec(r: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val out = new Array[Double](r.length)
    var i = 0
    while (i < r.length) {
      val row = r(i); var acc = 0.0; var j = 0
      while (j < x.length) { acc += row(j) * x(j); j += 1 }
      out(i) = acc; i += 1
    }
    out
  }

  /** Deterministic local per-block Lloyd's (mirrors [[PqAnn.train]]'s
    * distributed form): init = the first `k` sample rows' subvectors,
    * empty clusters keep their previous centroid.
    */
  private def trainPqLocal(x: Array[Array[Double]], m: Int, k: Int, dsub: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val kAct = math.min(k, x.length)
    (0 until m).toArray.map { b =>
      val subs = x.map(_.slice(b * dsub, (b + 1) * dsub))
      var cent = Array.tabulate(kAct)(i => subs(i).clone())
      (0 until iters).foreach { _ =>
        val sums = Array.fill(kAct)(new Array[Double](dsub))
        val counts = new Array[Int](kAct)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < kAct) {
            var dd = 0.0; var j = 0
            while (j < dsub) { val t = s(j) - cent(c)(j); dd += t * t; j += 1 }
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += s(j); j += 1 }
        }
        cent = Array.tabulate(kAct) { c =>
          if (counts(c) == 0) cent(c)
          else sums(c).map(_ / counts(c))
        }
      }
      cent
    }
  }

  private def reconstruct(cb: Array[Array[Array[Double]]], x: Array[Double],
      dsub: Int): Array[Double] = {
    val out = new Array[Double](x.length)
    var b = 0
    while (b < cb.length) {
      val cent = cb(b)
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cent.length) {
        var dd = 0.0; var j = 0
        while (j < dsub) { val t = x(b * dsub + j) - cent(c)(j); dd += t * t; j += 1 }
        if (dd < bestD) { bestD = dd; best = c }
        c += 1
      }
      System.arraycopy(cent(best), 0, out, b * dsub, dsub)
      b += 1
    }
    out
  }

  /** OPQ-NP training: `opqIters` alternations of local PQ training and
    * the Procrustes rotation update on a `sampleSize` hash-ranked sample.
    */
  def train(corpus: DataFrame, m: Int = 8, k: Int = 32,
      lloydIters: Int = 4, opqIters: Int = 6, sampleSize: Int = 2000,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    val x: Array[Array[Double]] = corpus
      .select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
      .withColumn("__h", xxhash64(col("__id")))
      .orderBy(col("__h"), col("__id")).limit(sampleSize)
      .select("__v").collect().map(_.getSeq[Double](0).toArray)
    require(x.nonEmpty, "cannot train OPQ on an empty corpus")
    val d = x.head.length
    require(d % m == 0, s"embedding dim $d must divide into m=$m blocks")
    val dsub = d / m

    var r = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var cb: Array[Array[Array[Double]]] = null
    (0 until opqIters).foreach { _ =>
      val xr = x.map(matvec(r, _))
      cb = trainPqLocal(xr, m, k, dsub, lloydIters)
      // Procrustes: min_R ||R·X - Y||_F with Y the reconstructions of the
      // CURRENT rotated sample -> SVD(sum y xT) = U S Vt, R = U·Vt
      val mMat = DenseMatrix.zeros[Double](d, d)
      x.indices.foreach { i =>
        val y = reconstruct(cb, xr(i), dsub)
        val xi = x(i)
        var a = 0
        while (a < d) {
          var bj = 0
          while (bj < d) { mMat(a, bj) += y(a) * xi(bj); bj += 1 }
          a += 1
        }
      }
      val s = svd(mMat)
      val rNew = s.U * s.Vt
      r = Array.tabulate(d, d)((i, j) => rNew(i, j))
    }
    // final codebooks under the final rotation, in PqAnn's layout
    val cbFinal = trainPqLocal(x.map(matvec(r, _)), m, k, dsub, lloydIters)
    val flat = for {
      b <- cbFinal.indices
      c <- cbFinal(b).indices
    } yield (b, c, cbFinal(b)(c).toSeq)
    Model(r, PqAnn.Model(m, cbFinal.head.length, dsub, flat.toArray))
  }

  /** Encode = rotate (one MatVec pass) + [[PqAnn.encode]]; vnorm is taken
    * on the rotated vector, which equals the original norm (R orthogonal).
    */
  def encode(corpus: DataFrame, mo: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    PqAnn.encode(corpus.withColumn(vecCol, rotate(col(vecCol), mo)), mo.pq, idCol, vecCol)

  /** Raw ADC top-k in the rotated space (cosines are rotation-invariant). */
  def topK(encoded: DataFrame, queries: DataFrame, mo: Model, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    PqAnn.topK(encoded,
      queries.withColumn(vecCol, rotate(col(vecCol), mo)), mo.pq, k, idCol, vecCol)

  /** ADC shortlist in rotated space + exact re-rank on ORIGINAL vectors. */
  def topKRefined(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      mo: Model, k: Int = 5, refine: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val short = topK(encoded, queries, mo, k * refine, idCol, vecCol)
      .select(col("vec_id").as("q_id"), col("neighbor_id").as("c_id"))
    PqAnn.rerankExact(short, corpus, queries, k, idCol, vecCol)
  }

  /** Persist rotation + codebooks + codes once per corpus version
    * ([[IvfAnn]]'s content-keyed staleness scheme).
    */
  def buildOrLoad(spark: SparkSession, corpus: DataFrame, path: String,
      m: Int = 8, k: Int = 32, lloydIters: Int = 4, opqIters: Int = 6,
      sampleSize: Int = 2000,
      idCol: String = "vec_id", vecCol: String = "embedding",
      version: Option[String] = None): (Model, DataFrame) = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = version.map(v => s"v:$v").getOrElse {
      val fp = IvfAnn.fingerprint(corpus, idCol, vecCol); s"opq:${fp._1},${fp._2}"
    }
    if (fs.exists(p) && IvfAnn.readStamp(fs, path).contains(stamp)) load(spark, path)
    else {
      val mo = train(corpus, m, k, lloydIters, opqIters, sampleSize, idCol, vecCol)
      mo.rotation.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
        .toDF("i", "row").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/rotation")
      PqAnn.save(spark, mo.pq, encode(corpus, mo, idCol, vecCol), path)
      IvfAnn.writeStamp(fs, path, stamp)
      (mo, spark.read.parquet(s"$path/codes"))
    }
  }

  def load(spark: SparkSession, path: String): (Model, DataFrame) = {
    val rot = spark.read.parquet(s"$path/rotation").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val (pq, codes) = PqAnn.load(spark, path)
    (Model(rot, pq), codes)
  }
}
