package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Remaining §2.6 surface: exact + approximate distinct, the typed UDAF
  * extension point, and the multimodal pipeline end-to-end.
  */
object Misc {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Typed UDAF example — the `Aggregator[IN, BUF, OUT]` surface. Weighted
    * mean keeps a (weighted sum, weight) buffer; merge is associative so
    * partial aggregation works map-side like any built-in.
    */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaDouble)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  val entries: Seq[QueryDef] = Seq(

    // exact distinct counting (shuffle-dedup under the hood)
    QueryDef.checked(
      "q39_count_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    },

    // HLL++ approximate distinct — no cross-engine oracle (sketches differ);
    // MiscSpec pins the relative error against the exact count instead.
    QueryDef.rowsOnly("q40_approx_distinct") { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          // KLL/GK quantile sketch — same rows-only treatment, error bound
          // pinned in MiscSpec against the exact percentile
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_p50"))
    },

    // typed-Aggregator UDAF: quantity-weighted mean price per flag
    QueryDef.checked(
      "q41_udaf_weighted_mean",
      """SELECT l_returnflag,
        |  coalesce(sum(l_extendedprice * l_quantity) / sum(l_quantity), 0.0)
        |    AS w_avg_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val wm = udaf(WeightedMean)
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(wm(col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))
    },

    // multimodal pipeline end-to-end: synthesize REAL payloads (PNG via
    // javax.imageio, PCM WAV, MJPEG-in-AVI video), decode them with real
    // parsers, aggregate the metadata. The oracle recomputes the encoded
    // geometry from doc_id alone — a three-way agreement between encoder,
    // decoder, and an independent SQL derivation. (Byte sizes are
    // codec-dependent and deliberately not part of the checked output.)
    QueryDef.checked(
      "q42_multimodal_meta",
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
        |  count(*) AS n_media,
        |  avg(CASE doc_id % 3 WHEN 0 THEN 8 + doc_id * 31 % 64
        |      WHEN 1 THEN 0 ELSE 16 + doc_id * 31 % 48 END) AS avg_width,
        |  avg(CASE doc_id % 3 WHEN 0 THEN 8 + doc_id * 17 % 64
        |      WHEN 1 THEN 0 ELSE 16 + doc_id * 17 % 48 END) AS avg_height,
        |  CAST(sum(CASE doc_id % 3 WHEN 0 THEN 1
        |      WHEN 1 THEN 800 + doc_id * 13 % 1600
        |      ELSE 1 + doc_id % 24 END) AS BIGINT) AS sum_frames
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      implicit val sp: SparkSession = s
      val media = Multimodal.synthesize(t(s, dir, "documents"))
      Multimodal.decode(media).groupBy(col("format"))
        .agg(
          count(lit(1)).as("n_media"),
          avg(col("width")).as("avg_width"),
          avg(col("height")).as("avg_height"),
          sum(col("n_frames")).as("sum_frames"))
    },

    // resize stage under the oracle: synthesize → resize(24×18) → decode.
    // Images land at exactly the target box (re-encoded through the real
    // PNG codec); audio/video pass through with their original geometry —
    // all three independently derivable from doc_id by the SQL side.
    QueryDef.checked(
      "q60_multimodal_resize",
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
        |  count(*) AS n_media,
        |  avg(CASE doc_id % 3 WHEN 0 THEN 24
        |      WHEN 1 THEN 0 ELSE 16 + doc_id * 31 % 48 END) AS avg_width,
        |  avg(CASE doc_id % 3 WHEN 0 THEN 18
        |      WHEN 1 THEN 0 ELSE 16 + doc_id * 17 % 48 END) AS avg_height
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      implicit val sp: SparkSession = s
      val media = Multimodal.synthesize(t(s, dir, "documents"))
      Multimodal.decode(Multimodal.resize(media, 24, 18)).groupBy(col("format"))
        .agg(
          count(lit(1)).as("n_media"),
          avg(col("width")).as("avg_width"),
          avg(col("height")).as("avg_height"))
    },

    // frame sampling fan-out over the synthetic video corpus — every
    // sampled frame is REALLY decoded (idx1 walk + JPEG decode) and the
    // per-doc counts derive from the decoded index, so this is now
    // SQL-oracle-checkable: ceil(n_frames / 10) sampled frames per video
    QueryDef.checked(
      "q43_multimodal_frames",
      """SELECT doc_id, CAST(ceil((1 + doc_id % 24) / 10.0) AS BIGINT) AS n_sampled
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin) { (s, dir) =>
      implicit val sp: SparkSession = s
      val media = Multimodal.synthesize(t(s, dir, "documents"))
      Multimodal.frameSample(media)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sampled"))
    },

    // the multimodal → similarity composition: decoded-content features
    // (luminance histograms of real pixels) feed the SAME top-k machinery
    // as text embeddings — media near-dup search with zero new operators.
    // Rows-only: no SQL engine can decode the media; the feature
    // invariants (normalization, determinism) are spec-pinned instead.
    QueryDef.rowsOnly("q64_media_similarity") { (s, dir) =>
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      // features are codec-bound → MATERIALIZED once per corpus version
      // (MediaFeatures artifact). The media bytes are a pure function of
      // doc_id, so the id-set fingerprint is an exact, column-pruned
      // staleness key — no re-encode just to check freshness.
      val fp = docs.agg(count(lit(1)), bit_xor(xxhash64(col("doc_id")))).head()
      val scratch = s"${sys.props("java.io.tmpdir")}/graft-scratch/media_" +
        dir.replaceAll("[^a-zA-Z0-9.]", "_")
      val imgs = graft.multimodal.MediaFeatures
        .features(s, Multimodal.synthesize(docs), scratch, dim = 16,
          version = Some(s"${fp.getLong(0)},${fp.getLong(1)}"))
        .filter(col("doc_id") % 3 === 0)
      graft.operators.Similarity.bruteForceTopK(
        imgs, imgs.filter(col("doc_id") < 90), k = 3,
        idCol = "doc_id", vecCol = "embedding")
    },

    // equal-width value histogram — the distribution-profiling tier above
    // statsManifest's min/max: bucket counts + per-bucket ranges in one
    // aggregation after a 1-row bounds broadcast.
    QueryDef.checked(
      "q104_histogram",
      """WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |           FROM lineitem)
        |SELECT CAST(least(floor((l_extendedprice - lo) / (hi - lo) * 16), 15)
        |            AS BIGINT) AS bucket,
        |  count(*) AS n, round(min(l_extendedprice), 2) AS bucket_min,
        |  round(max(l_extendedprice), 2) AS bucket_max
        |FROM lineitem, b GROUP BY 1""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val b = li.agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      li.crossJoin(b)
        .select(least(floor((col("l_extendedprice") - col("lo")) /
            (col("hi") - col("lo")) * 16), lit(15.0)).cast("long").as("bucket"),
          col("l_extendedprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 2).as("bucket_min"),
          round(max(col("l_extendedprice")), 2).as("bucket_max"))
    },

    // per-group z-score outliers — the cheap anomaly gate over any
    // numeric column: one group aggregate broadcast back, pure filter.
    QueryDef.checked(
      "q105_zscore_outliers",
      """WITH s AS (SELECT c_nationkey, avg(c_acctbal) AS mu,
        |           stddev_samp(c_acctbal) AS sd, count(*) AS n
        |           FROM customer GROUP BY 1)
        |SELECT c_custkey, c.c_nationkey, round((c_acctbal - mu) / sd, 6) AS z
        |FROM customer c JOIN s ON c.c_nationkey = s.c_nationkey
        |WHERE n >= 3 AND sd > 0 AND abs((c_acctbal - mu) / sd) > 1.5""".stripMargin) {
      (s, dir) =>
        val cust = t(s, dir, "customer")
        val stats = cust.groupBy(col("c_nationkey"))
          .agg(avg(col("c_acctbal")).as("mu"), stddev_samp(col("c_acctbal")).as("sd"),
            count(lit(1)).as("n"))
        cust.join(stats, Seq("c_nationkey"))
          .filter(col("n") >= 3 && col("sd") > 0 &&
            abs((col("c_acctbal") - col("mu")) / col("sd")) > 1.5)
          .select(col("c_custkey"), col("c_nationkey"),
            round((col("c_acctbal") - col("mu")) / col("sd"), 6).as("z"))
    }
  )
}
