package graft.multimodal

/** Minimal MJPEG-in-AVI container codec — pure JVM. RIFF framing is
  * written by hand per the public AVI structure
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * 00dc…) idx1)`; each frame payload is a real JPEG via `javax.imageio`.
  * This replaces the synthetic-header video stub: files are decodable by
  * any MJPEG-capable player, and frame access walks the `idx1` index —
  * the container's standard seek path — rather than rescanning `movi`.
  *
  * All integers little-endian per RIFF.
  */
private[graft] object Avi {

  final case class Meta(width: Int, height: Int, nFrames: Int)

  /** Absolute (offset, length) of one frame's JPEG bytes inside the file. */
  final case class FrameRef(offset: Int, length: Int)

  private def le32(i: Int): Array[Byte] =
    Array(i, i >> 8, i >> 16, i >> 24).map(_.toByte)
  private def le16(i: Int): Array[Byte] = Array(i, i >> 8).map(_.toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, body: Array[Byte]): Array[Byte] =
    cc(id) ++ le32(body.length) ++ body ++
      (if ((body.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(listType) ++ body)

  /** One solid-color frame, deterministic in (id, frameIdx). */
  private[graft] def frameColor(id: Long, frameIdx: Int): Int =
    ((id * 0x9E3779B9L + frameIdx * 0x85EBCA6BL) & 0xFFFFFFL).toInt

  private def jpegFrame(id: Long, frameIdx: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(frameColor(id, frameIdx)))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Encode `nFrames` deterministic solid-color JPEG frames at w×h, 10 fps. */
  def encode(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val jpegs = Array.tabulate(nFrames)(i => jpegFrame(id, i, w, h))
    val maxChunk = if (jpegs.isEmpty) 0 else jpegs.map(_.length).max

    val avih = chunk("avih",
      le32(100000) ++ le32(0) ++ le32(0) ++ le32(0x10 /* AVIF_HASINDEX */) ++
        le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(maxChunk) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
        le32(1) ++ le32(10) ++ le32(0) ++ le32(nFrames) ++ le32(maxChunk) ++
        le32(-1) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ cc("MJPG") ++
        le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    // movi chunks + idx1 entries: dwChunkOffset is relative to the 'movi'
    // fourcc (first chunk ckid sits 4 bytes in), the common convention
    val moviChunks = new java.io.ByteArrayOutputStream()
    val idxBody = new java.io.ByteArrayOutputStream()
    var rel = 4
    jpegs.foreach { j =>
      val c = chunk("00dc", j)
      moviChunks.write(c)
      idxBody.write(cc("00dc")); idxBody.write(le32(0x10 /* AVIIF_KEYFRAME */))
      idxBody.write(le32(rel)); idxBody.write(le32(j.length))
      rel += c.length
    }
    val movi = list("movi", moviChunks.toByteArray)
    val idx1 = chunk("idx1", idxBody.toByteArray)

    val payload = cc("AVI ") ++ hdrl ++ movi ++ idx1
    cc("RIFF") ++ le32(payload.length) ++ payload
  }

  def isAvi(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def buf(bytes: Array[Byte]) =
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  private def fourcc(bb: java.nio.ByteBuffer): String = {
    val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
  }

  /** (avih geometry, movi fourcc position, idx1 body range) in one walk. */
  private def scan(bytes: Array[Byte]): (Meta, Int, Int, Int) = {
    require(isAvi(bytes), "not a RIFF/AVI payload")
    val bb = buf(bytes)
    bb.position(12)
    var meta: Meta = null
    var moviPos = -1
    var idxOff = -1; var idxLen = -1
    while (bb.remaining() >= 8) {
      val id = fourcc(bb)
      val sz = bb.getInt()
      val bodyStart = bb.position()
      if (id == "LIST") {
        val lt = fourcc(bb)
        if (lt == "hdrl") {
          // avih is hdrl's first subchunk
          val sub = fourcc(bb); val subSz = bb.getInt()
          require(sub == "avih", s"expected avih, got $sub")
          val p = bb.position()
          bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt()
          val totalFrames = bb.getInt()
          bb.getInt(); bb.getInt(); bb.getInt()
          val w = bb.getInt(); val h = bb.getInt()
          meta = Meta(w, h, totalFrames)
          bb.position(p + subSz + (subSz & 1))
        } else if (lt == "movi") {
          moviPos = bodyStart // position of the 'movi' fourcc itself
        }
      } else if (id == "idx1") {
        idxOff = bodyStart; idxLen = sz
      }
      bb.position(bodyStart + sz + (sz & 1))
    }
    require(meta != null, "missing avih header")
    require(moviPos >= 0, "missing movi list")
    require(idxOff >= 0, "missing idx1 index")
    (meta, moviPos, idxOff, idxLen)
  }

  def meta(bytes: Array[Byte]): Meta = {
    val (m, _, idxOff, idxLen) = scan(bytes)
    // integrity: the index must agree with the header's frame count
    val nIdx = countVideoEntries(bytes, idxOff, idxLen)
    require(nIdx == m.nFrames, s"idx1 has $nIdx video entries, avih says ${m.nFrames}")
    m
  }

  private def countVideoEntries(bytes: Array[Byte], idxOff: Int, idxLen: Int): Int = {
    val bb = buf(bytes); bb.position(idxOff)
    var n = 0; var i = 0
    while (i < idxLen / 16) {
      if (fourcc(bb) == "00dc") n += 1
      bb.getInt(); bb.getInt(); bb.getInt()
      i += 1
    }
    n
  }

  /** Frame locations from the idx1 index (offsets resolved to absolute). */
  def frameIndex(bytes: Array[Byte]): Array[FrameRef] = {
    val (_, moviPos, idxOff, idxLen) = scan(bytes)
    val bb = buf(bytes); bb.position(idxOff)
    val out = Array.newBuilder[FrameRef]
    var i = 0
    while (i < idxLen / 16) {
      val ckid = fourcc(bb)
      bb.getInt() // flags
      val off = bb.getInt()
      val len = bb.getInt()
      // +8 skips the chunk's own ckid+size to land on the JPEG bytes
      if (ckid == "00dc") out += FrameRef(moviPos + off + 8, len)
      i += 1
    }
    out.result()
  }

  def readFrame(bytes: Array[Byte], ref: FrameRef): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes, ref.offset, ref.length))
    require(img != null, "unreadable MJPEG frame")
    img
  }
}
