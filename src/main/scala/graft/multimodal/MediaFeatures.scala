package graft.multimodal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-content media features as a MATERIALIZED artifact — the
  * [[graft.operators.DedupPipeline]] pattern applied to the multimodal
  * tier: feature extraction is codec-bound (every consumer pays a full
  * PNG/WAV/MJPEG decode of the corpus), so a 100 TB pipeline computes the
  * feature table ONCE per corpus version and every similarity/dedup
  * consumer reads the compact (doc_id, embedding) relation instead of the
  * raw bytes.
  *
  * Layout under `scratchDir`:
  *   features/     (doc_id, embedding array<float>[dim])
  *   _fingerprint  "count,xorOfRowHashes,dim" (written LAST — commit marker)
  *
  * Staleness follows the shared scheme: content fingerprint by default
  * (one metadata-cheap hash pass over the media bytes — far cheaper than
  * decode, but still a scan), or an explicit `version` id for zero-scan
  * reuse on immutable/versioned corpora.
  */
object MediaFeatures {

  private def fingerprint(media: Dataset[Multimodal.MediaRow]): (Long, Long) = {
    val r = media.toDF().agg(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("media")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private val buildLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Build the feature table under `scratchDir` unless an artifact for
    * this corpus version + dim already exists. Returns true when it
    * (re)built.
    */
  def materialize(spark: SparkSession, media: Dataset[Multimodal.MediaRow],
      scratchDir: String, dim: Int = 16,
      version: Option[String] = None): Boolean =
    buildLocks.computeIfAbsent(scratchDir, _ => new Object).synchronized {
      val root = new Path(scratchDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val fpFile = new Path(root, "_fingerprint")
      val stamp = version.map(v => s"v:$v,$dim").getOrElse {
        val fp = fingerprint(media); s"${fp._1},${fp._2},$dim"
      }
      val current =
        if (!fs.exists(fpFile)) None
        else {
          val in = fs.open(fpFile)
          try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString) finally in.close()
        }
      if (current.contains(stamp)) false
      else {
        if (fs.exists(fpFile)) fs.delete(fpFile, false) // invalidate before rewrite
        Multimodal.features(media, dim)(spark)
          .write.mode("overwrite").parquet(s"$scratchDir/features")
        val out = fs.create(fpFile, true)
        try out.write(stamp.getBytes("UTF-8")) finally out.close()
        true
      }
    }

  /** The feature table for this corpus version (materializing if needed):
    * (doc_id, embedding).
    */
  def features(spark: SparkSession, media: Dataset[Multimodal.MediaRow],
      scratchDir: String, dim: Int = 16,
      version: Option[String] = None): DataFrame = {
    materialize(spark, media, scratchDir, dim, version)
    spark.read.parquet(s"$scratchDir/features")
  }
}
