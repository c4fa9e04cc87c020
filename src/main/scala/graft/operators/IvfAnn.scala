package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor — the centroid-
  * partitioned scale path for similarity search (SURVEY §2.6 extension:
  * "IVF or LSH-bucketed variant").
  *
  * Train: deterministic mini-kmeans (hash-sampled init, fixed Lloyd
  * rounds, all DataFrame ops — the only driver state is the k×dim
  * centroid table, which is tiny by construction). Search: assign the
  * corpus once to its nearest centroid (one narrow column), then answer
  * each query by scanning only the `nprobe` nearest centroid cells —
  * cost k·dim per row for assignment and |corpus|·nprobe/k per query,
  * vs |corpus| for brute force.
  */
object IvfAnn {

  /** (cid, unit-norm centroid vector) — k rows, safe to collect/broadcast. */
  final case class Model(centroids: Array[(Int, Seq[Double])]) {
    def k: Int = centroids.length
  }

  /** Above this k, centroid math switches from inline literal expressions
    * to a broadcast centroid TABLE: k literals per row compile into one
    * enormous expression tree (codegen method-size limits, plan explosion)
    * — fine at k=16, impossible at the k≈√n a 100 TB corpus wants. The
    * join form computes the same n×k dots distributed, then reduces to
    * one row per input via partial aggregation before the narrow shuffle.
    */
  private val maxExprK = 64

  private def centroidDf(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.centroids.toSeq.toDF("__cid", "__c")
  }

  /** Nearest-centroid id for a vector column under the model (argmax of
    * dot with unit centroids) — the small-k expression form.
    */
  private def nearestCid(vec: Column, m: Model, n: Int): Column = {
    val dots = m.centroids.take(n).map { case (cid, c) =>
      struct(fdot(vec, typedlit(c)).as("d"), lit(cid).as("cid"))
    }
    // array_max on struct(d, cid): lexicographic → max dot, ties → max cid
    array_max(array(dots.toIndexedSeq: _*)).getField("cid")
  }

  /** df + `cid` column (nearest centroid of `vecCol`, which must already
    * be array<double>): expression form at small k, broadcast-join +
    * max-struct aggregation + join-back at large k. `keyCol` must be a
    * row identity (used to reduce the n×k fan-out back to n rows).
    */
  private[graft] def withNearestCid(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, m: Model, keyCol: String, vecCol: String,
      exprK: Int = maxExprK): DataFrame =
    if (m.k <= exprK) df.withColumn("cid", nearestCid(col(vecCol), m, m.k))
    else {
      // same (d, cid) lexicographic max as the expression form, computed
      // as: broadcast cross with the k-row centroid table → partial
      // max-aggregation (map-side — the n×k fan-out never shuffles) →
      // one narrow join back on the row key
      val best = df.select(col(keyCol), col(vecCol))
        .crossJoin(broadcast(centroidDf(spark, m)))
        .withColumn("__d", fdot(col(vecCol), col("__c")))
        .groupBy(keyCol)
        .agg(max(struct(col("__d"), col("__cid"))).getField("__cid").as("cid"))
      df.join(best, keyCol)
    }

  /** `nprobe` nearest centroid ids for a query vector (sorted by -dot) —
    * the small-k expression form.
    */
  private def probeCids(vec: Column, m: Model, nprobe: Int): Column = {
    val dots = m.centroids.map { case (cid, c) =>
      struct((-fdot(vec, typedlit(c))).as("nd"), lit(cid).as("cid"))
    }
    slice(transform(array_sort(array(dots.toIndexedSeq: _*)), s => s.getField("cid")), 1, nprobe)
  }

  /** df fanned out to one row per (row, probed cid): expression form at
    * small k; at large k a broadcast cross + per-key rank (queries are the
    * BOUNDED side, so the window over `keyCol` stays cheap). Tie order
    * matches [[probeCids]] (dot desc, then cid asc).
    */
  private[graft] def withProbeCids(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, m: Model, nprobe: Int, keyCol: String, vecCol: String,
      exprK: Int = maxExprK): DataFrame =
    if (m.k <= exprK)
      df.withColumn("cid", explode(probeCids(col(vecCol), m, nprobe)))
    else df
      .crossJoin(broadcast(centroidDf(spark, m)))
      .withColumn("__d", fdot(col(vecCol), col("__c")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCol).orderBy(col("__d").desc, col("__cid"))))
      .filter(col("__rn") <= nprobe)
      .withColumn("cid", col("__cid"))
      .drop("__d", "__rn", "__c", "__cid")

  /** Deterministic mini-kmeans: init = k hash-ranked rows, `iters` Lloyd
    * rounds, centroids re-normalized each round (spherical kmeans, which
    * is what cosine search wants).
    */
  def train(corpus: DataFrame, k: Int = 16, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {

    val vecs = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("v", transform(col("v"), x => x / norm(col("v"))))

    def collectModel(df: DataFrame): Model = Model(
      df.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1))

    // init: k deterministic pseudo-random rows, renumbered 0..k-1
    // driver-side (k rows — a global row_number window here would emit
    // Spark's single-partition warning for nothing)
    var model = Model(
      vecs.withColumn("h", xxhash64(col("id")))
        .orderBy(col("h")).limit(k)
        .select(col("v")).collect()
        .map(_.getSeq[Double](0)).zipWithIndex.map { case (v, i) => (i, v) })

    (0 until iters).foreach { _ =>
      val assigned = withNearestCid(corpus.sparkSession, vecs, model, "id", "v")
      // elementwise mean per cluster, renormalized
      val updated = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
        .withColumn("c", transform(col("c"), x => x / norm(col("c"))))
        .select(col("cid"), col("c"))
      model = collectModel(updated)
    }
    model
  }

  /** Persist a model as a tiny (k rows × dim) parquet artifact. */
  def save(spark: org.apache.spark.sql.SparkSession, m: Model, path: String): Unit = {
    import spark.implicits._
    m.centroids.toSeq.toDF("cid", "c").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted model. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = Model(
    spark.read.parquet(path).collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1))

  /** Cheap corpus identity: (row count, XOR of per-row xxhash64(id, vec)).
    * XOR is order-independent (the corpus has no canonical row order) and
    * cannot overflow under ANSI arithmetic; one column-pruned pass.
    */
  private[operators] def fingerprint(corpus: DataFrame,
      idCol: String, vecCol: String): (Long, Long) = {
    val r = corpus.agg(count(lit(1)), bit_xor(xxhash64(col(idCol), col(vecCol)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private[operators] def fpPath(path: String) = new org.apache.hadoop.fs.Path(path, "_fingerprint")

  private[operators] def writeStamp(fs: org.apache.hadoop.fs.FileSystem, path: String,
      stamp: String): Unit = {
    val out = fs.create(fpPath(path), true)
    try out.write(stamp.getBytes("UTF-8")) finally out.close()
  }

  private[operators] def readStamp(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[String] =
    if (!fs.exists(fpPath(path))) None
    else {
      val in = fs.open(fpPath(path))
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString) finally in.close()
    }

  /** Train-once semantics: reuse the persisted model while it matches the
    * corpus, else train and persist. At scale, training is its own
    * (infrequent) job and the model is an artifact; the QUERY path must
    * only assign + probe — k Lloyd passes over the corpus per query
    * invocation would re-read the whole table every time.
    *
    * Staleness: the artifact carries a corpus FINGERPRINT (count + XOR of
    * row hashes — `_fingerprint`, an underscore file so parquet reads
    * ignore it). A corpus rewritten IN PLACE under the same path retrains
    * instead of silently reusing stale centroids; the fingerprint pass is
    * one column-pruned scan, far cheaper than the `iters` training scans
    * it guards. Explicitly-versioned corpora (the 100 TB norm — snapshot
    * ids, immutable partitions) can pass `version` instead and pay ZERO
    * staleness scans; the caller owns the promise that a version id never
    * changes content.
    */
  def trainOrLoad(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
      path: String, k: Int = 16, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      version: Option[String] = None): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = version.map(v => s"v:$v").getOrElse {
      val fp = fingerprint(corpus, idCol, vecCol); s"${fp._1},${fp._2}"
    }
    if (fs.exists(p) && readStamp(fs, path).contains(stamp)) load(spark, path)
    else {
      val m = train(corpus, k, iters, idCol, vecCol)
      save(spark, m, path)
      writeStamp(fs, path, stamp)
      m
    }
  }

  /** Approximate top-k: exact cosine, restricted to the query's `nprobe`
    * nearest centroid cells. Output: (vec_id, neighbor_id, cos, rn).
    */
  def topK(corpus: DataFrame, queries: DataFrame, m: Model, k: Int = 5,
      nprobe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val c = withNearestCid(spark,
        corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
          .withColumn("c_norm", fnorm(col("c_vec")))
          .withColumn("__vd", asDouble(col("c_vec"))),
        m, "c_id", "__vd")
      .drop("__vd")
    val q = withProbeCids(spark,
        queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
          .withColumn("q_norm", fnorm(col("q_vec")))
          .withColumn("__vd", asDouble(col("q_vec"))),
        m, nprobe, "q_id", "__vd")
      .drop("__vd")
    c.join(broadcast(q), Seq("cid"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", fdot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("c_id").as("neighbor_id"), col("cos"), col("rn"))
  }
}
