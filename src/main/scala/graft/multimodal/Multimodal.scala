package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.6 extension tier): media as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches — the JVM analogue of arrow-batched pandas UDFs.
  *
  * Decode is REAL for all three formats, pure JVM: PNG (`javax.imageio`),
  * WAV (RIFF chunk parse), and MJPEG-in-AVI video ([[Avi]]: hand-framed
  * RIFF container, per-frame JPEG via `javax.imageio`, frame access
  * through the idx1 index). The synthesized corpus encodes geometry as
  * deterministic functions of doc_id, so decoded metadata is
  * independently computable by the SQL oracle (q42): a real encoder wrote
  * the bytes, a real decoder read them back, and a third party checks the
  * agreement.
  */
object Multimodal {

  /** One media object: id + opaque payload. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Typed metadata extracted by the decoder. For audio, `n_frames` is the
    * PCM sample-frame count.
    */
  final case class DecodedRow(doc_id: Long, format: String, width: Int,
      height: Int, n_frames: Int, n_bytes: Long)

  /** One sampled frame; `frame_hash` hashes the DECODED pixel data. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_hash: Long)

  // Deterministic synthetic geometry — kept SQL-reproducible (q42's oracle
  // recomputes these from doc_id alone). Dims stay small: encode cost is
  // per-pixel (video additionally per-frame).
  private[multimodal] def pngW(id: Long): Int = (8 + id * 31 % 64).toInt
  private[multimodal] def pngH(id: Long): Int = (8 + id * 17 % 64).toInt
  private[multimodal] def wavSamples(id: Long): Int = (800 + id * 13 % 1600).toInt
  private[multimodal] def videoW(id: Long): Int = (16 + id * 31 % 48).toInt
  private[multimodal] def videoH(id: Long): Int = (16 + id * 17 % 48).toInt
  private[multimodal] def videoFrames(id: Long): Int = (1 + id % 24).toInt

  /** Deterministic synthetic payload per document — the stand-in corpus.
    * doc_id % 3: 0 → a real PNG, 1 → a real PCM WAV, 2 → a real
    * MJPEG-in-AVI video ([[Avi.encode]]).
    */
  def synthesize(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val payload = (id % 3) match {
        case 0 => pngBytes(id)
        case 1 => wavBytes(id)
        case _ => videoBytes(id)
      }
      MediaRow(id, payload)
    }
  }

  private def pngBytes(id: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no tmp files
    val (w, h) = (pngW(id), pngH(id))
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(((id * 0x9E3779B9L) & 0xFFFFFFL).toInt))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val dataLen = n * 2 // mono, 16-bit PCM
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(8000 * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    var x = id * 2654435761L
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.putShort((x >>> 48).toShort)
      i += 1
    }
    bb.array()
  }

  private def videoBytes(id: Long): Array[Byte] =
    Avi.encode(id, videoW(id), videoH(id), videoFrames(id))

  /** Decode by content sniffing: PNG, WAV, and AVI are all parsed by real
    * decoders. The mapPartitions batch shape (one iterator per partition,
    * no driver involvement) is what a production codec drops into.
    */
  def decode(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(m => decodeOne(m.doc_id, m.media))
    }
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isWav(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private[multimodal] def decodeOne(id: Long, bytes: Array[Byte]): DecodedRow =
    if (isPng(bytes)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"unreadable PNG for doc $id")
      DecodedRow(id, "img", img.getWidth, img.getHeight, 1, bytes.length.toLong)
    } else if (isWav(bytes)) {
      // RIFF chunk walk: fmt_ gives the frame size, data gives the length
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(12)
      var channels = 0; var bits = 0; var dataLen = -1
      while (bb.remaining() >= 8) {
        val cid = new String(Array(bb.get(), bb.get(), bb.get(), bb.get()).map(_.toChar))
        val sz = bb.getInt()
        if (cid == "fmt ") {
          val p = bb.position()
          bb.getShort() // audio format tag
          channels = bb.getShort().toInt
          bb.getInt() // sample rate
          bb.getInt() // byte rate
          bb.getShort() // block align
          bits = bb.getShort().toInt
          bb.position(p)
        }
        if (cid == "data") dataLen = sz
        bb.position(bb.position() + sz + (sz & 1)) // chunks are 2-byte aligned
      }
      require(channels > 0 && bits > 0 && dataLen >= 0, s"malformed WAV for doc $id")
      val frames = dataLen / (channels * bits / 8)
      DecodedRow(id, "audio", 0, 0, frames, bytes.length.toLong)
    } else if (Avi.isAvi(bytes)) {
      val m = Avi.meta(bytes) // verifies idx1 agrees with the avih header
      DecodedRow(id, "video", m.width, m.height, m.nFrames, bytes.length.toLong)
    } else {
      throw new IllegalArgumentException(s"unknown media payload for doc $id")
    }

  /** FNV-1a over the decoded frame's RGB pixels — a content hash of the
    * DECODED image, deterministic for a given JPEG decoder.
    */
  private[multimodal] def pixelHash(img: java.awt.image.BufferedImage): Long = {
    var h = 0xcbf29ce484222325L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h = (h ^ (img.getRGB(x, y) & 0xFFFFFF)) * 0x100000001b3L
        x += 1
      }
      y += 1
    }
    h
  }

  /** Sample every `everyN`-th frame of each video as its own row (the
    * frame-level fan-out a vision pipeline feeds to feature extraction).
    * Frames are REALLY decoded: the idx1 index locates the chunk (no
    * rescan of the container), `javax.imageio` decodes the JPEG, and
    * frame_hash digests the decoded pixels.
    */
  def frameSample(media: Dataset[MediaRow], everyN: Int = 10)
      (implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.filter(m => Avi.isAvi(m.media)).flatMap { m =>
        val idx = Avi.frameIndex(m.media)
        (0 until idx.length by everyN).iterator.map { i =>
          FrameRow(m.doc_id, i, pixelHash(Avi.readFrame(m.media, idx(i))))
        }
      }
    }
  }

  /** Resize image media to exactly (w, h): real `javax.imageio` decode,
    * bilinear `Graphics2D` scale, PNG re-encode. Non-image payloads pass
    * through untouched (a production pipeline forks per modality before
    * transforms). Same mapPartitions batch shape as [[decode]].
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int)
      (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        if (!isPng(m.media)) m
        else {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media))
          require(img != null, s"unreadable PNG for doc ${m.doc_id}")
          val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaRow(m.doc_id, bos.toByteArray)
        }
      }
    }
  }

  /** Content feature extraction: media bytes → fixed-dim float vector
    * computed from the DECODED content (not the container bytes) —
    * images: L1-normalized luminance histogram of the decoded pixels;
    * audio: per-window RMS envelope of the PCM samples; video:
    * luminance histogram of the decoded FIRST frame. Deterministic for a
    * given decoder, so downstream similarity search over these vectors is
    * reproducible. A learned-model embedding would slot into the same
    * mapPartitions batch shape; these classical features are real,
    * dependency-free stand-ins (the container ships no model runtime).
    */
  def features(media: Dataset[MediaRow], dim: Int = 16)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(m => (m.doc_id, featuresOne(m.doc_id, m.media, dim)))
    }.toDF("doc_id", "embedding")
  }

  private def lumaHistogram(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        // integer BT.601 luma in [0, 255]
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        v(math.min(dim - 1, luma * dim / 256)) += 1f
        x += 1
      }
      y += 1
    }
    val n = (img.getWidth * img.getHeight).toFloat
    v.map(_ / n)
  }

  private[multimodal] def featuresOne(id: Long, bytes: Array[Byte], dim: Int): Array[Float] =
    if (isPng(bytes)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"unreadable PNG for doc $id")
      lumaHistogram(img, dim)
    } else if (isWav(bytes)) {
      // 16-bit little-endian PCM mono (the synthesize() format): RMS per
      // `dim` equal windows over the data chunk — a coarse loudness
      // envelope, in [0, 1] per bin
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(12)
      var dataOff = -1; var dataLen = 0
      while (bb.remaining() >= 8) {
        val cid = new String(Array(bb.get(), bb.get(), bb.get(), bb.get()).map(_.toChar))
        val sz = bb.getInt()
        if (cid == "data") { dataOff = bb.position(); dataLen = sz }
        bb.position(bb.position() + sz + (sz & 1))
      }
      require(dataOff >= 0, s"malformed WAV for doc $id")
      val nSamples = dataLen / 2
      val v = new Array[Float](dim)
      val counts = new Array[Int](dim)
      var i = 0
      while (i < nSamples) {
        val s = (bytes(dataOff + 2 * i) & 0xff) | (bytes(dataOff + 2 * i + 1) << 8)
        val bin = math.min(dim - 1, i * dim / math.max(1, nSamples))
        val x = s / 32768f
        v(bin) += x * x
        counts(bin) += 1
        i += 1
      }
      Array.tabulate(dim)(b => if (counts(b) == 0) 0f
        else math.sqrt(v(b) / counts(b)).toFloat)
    } else if (Avi.isAvi(bytes)) {
      val idx = Avi.frameIndex(bytes)
      require(idx.nonEmpty, s"AVI with no frames for doc $id")
      lumaHistogram(Avi.readFrame(bytes, idx(0)), dim)
    } else {
      throw new IllegalArgumentException(s"unknown media payload for doc $id")
    }
}
