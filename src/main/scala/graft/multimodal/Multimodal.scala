package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.6 extension tier): media as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches — the JVM analogue of arrow-batched pandas UDFs.
  *
  * The decode step is a clearly-marked STUB: this container has no
  * image/audio codecs, so `decode` parses a deterministic synthetic header
  * instead of calling a real library. Everything around it — schema,
  * encoders, batch iteration, partitioning, the explode of frames — is the
  * real distributed shape a production decoder would drop into (swap
  * `parseHeader` for the codec call).
  */
object Multimodal {

  /** One media object: id + opaque payload. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Typed metadata extracted by the decoder. */
  final case class DecodedRow(doc_id: Long, format: String, width: Int,
      height: Int, n_frames: Int, n_bytes: Long)

  /** One sampled frame. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_hash: Long)

  private val Formats = Array("img", "audio", "video")
  private val Magic = 0x47524654 // "GRFT"

  /** Deterministic synthetic payload per document — the stand-in corpus.
    * Header: magic(4) | fmt(1) | width(2) | height(2) | n_frames(2), then
    * a pseudo-payload derived from the doc id.
    */
  def synthesize(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val fmt = (id % 3).toInt
      val w = (64 + (id * 31 % 960)).toInt
      val h = (64 + (id * 17 % 540)).toInt
      val frames = if (fmt == 2) (1 + id % 120).toInt else 1
      val payloadLen = (32 + id % 224).toInt
      val bb = java.nio.ByteBuffer.allocate(11 + payloadLen)
      bb.putInt(Magic).put(fmt.toByte)
        .putShort(w.toShort).putShort(h.toShort).putShort(frames.toShort)
      var i = 0; var x = id * 2654435761L
      while (i < payloadLen) { x = x * 6364136223846793005L + 1442695040888963407L; bb.put((x >>> 56).toByte); i += 1 }
      MediaRow(id, bb.array())
    }
  }

  /** STUB decode — parses the synthetic header. A real deployment replaces
    * the body of this function with the codec call; the mapPartitions batch
    * shape (one iterator per partition, no driver involvement) stays.
    */
  def decode(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val bb = java.nio.ByteBuffer.wrap(m.media)
        require(bb.getInt() == Magic, s"bad media payload for doc ${m.doc_id}")
        val fmt = Formats(bb.get().toInt)
        DecodedRow(m.doc_id, fmt, bb.getShort().toInt, bb.getShort().toInt,
          bb.getShort().toInt, m.media.length.toLong)
      }
    }
  }

  /** Sample every `everyN`-th frame of video media as its own row (the
    * frame-level fan-out a vision pipeline feeds to feature extraction).
    * frame_hash stands in for decoded frame bytes.
    */
  def frameSample(decoded: Dataset[DecodedRow], everyN: Int = 10)
      (implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    decoded.filter(col("format") === "video")
      .flatMap { d =>
        (0 until d.n_frames by everyN).map { i =>
          FrameRow(d.doc_id, i, scala.util.hashing.MurmurHash3.productHash((d.doc_id, i)).toLong)
        }
      }
  }

  /** STUB feature extraction: media bytes → fixed-dim float vector
    * (deterministic hash features; a real pipeline swaps in a model).
    */
  def features(media: Dataset[MediaRow], dim: Int = 16)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < m.media.length) { v(i % dim) += (m.media(i) & 0xff) / 255.0f; i += 1 }
        (m.doc_id, v)
      }
    }.toDF("doc_id", "embedding")
  }
}
