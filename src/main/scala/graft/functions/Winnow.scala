package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed k-gram fingerprints of a string in ONE O(n) pass: a 64-bit
  * polynomial rolling hash over every k-char gram (Karp–Rabin, so gram
  * hashing is O(1) amortized instead of O(k)), a monotonic-deque sliding
  * minimum over windows of `w` grams, and first-seen-order dedup —
  * `array<long>` out, one fingerprint per distinct window minimum.
  *
  * Semantically this is [[TextFunctions.winnow]] ∘
  * [[TextFunctions.kgramHashesFast]] with a different (still
  * deterministic, content-only) gram hash: equal substrings always hash
  * equal, so the winnowing guarantee — two documents sharing a run of
  * ≥ w+k−1 characters share a fingerprint — holds identically. Use THIS
  * form on hot candidate-generation paths: the HOF composition evaluates
  * interpreted (Spark does not codegen lambda functions) and its
  * `slice(kg, j, w)` allocates a w-element array per position, making it
  * O(n·w) with heavy garbage — measured 5.6 s for the sf0.1 documents
  * scan (1.5 M chars) where this expression does the same work in one
  * allocation-free pass. Same interpreted-HOF trap, and fix, as
  * [[BucketRank]] / VectorDot. Keep the md5-based
  * [[TextFunctions.kgramHashes]] + [[TextFunctions.winnow]] where a
  * DuckDB oracle must replay the exact selection (q61).
  *
  * Reference analogue: content verification at file granularity
  * (`CommonUtils.java:99-124`); this fingerprints substring content for
  * the span-dedup verify tier ([[graft.operators.SpanDedup]]).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"gram size k must be >= 1, got $k")
  require(w >= 1, s"window w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      WinnowFingerprints.fingerprints(v.asInstanceOf[UTF8String].toString, k, w))

  override def prettyName: String = "winnow_fingerprints"

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** The ORACLE-MIRRORED winnow — [[TextFunctions.winnow]] ∘
  * [[TextFunctions.kgramHashes]] (8-hex-char md5 gram hashes,
  * lexicographic window minima) computed natively in one pass, BIT-FOR-
  * BIT identical to the HOF composition, so queries whose DuckDB oracle
  * replays the md5 selection (q61) can use it without any oracle
  * change. The HOF form evaluates interpreted with a w-element `slice`
  * allocation per window (q61 measured ~3 s of the sf0.1 bench); here
  * the md5 per gram is the only real work. Code-point-aware substrings
  * (Spark's `substring` counts code points, not UTF-16 units), md5 over
  * the gram's UTF-8 bytes, min by lexicographic compare of the
  * fixed-width lowercase hex — exactly the Column semantics.
  */
case class Md5WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"gram size k must be >= 1, got $k")
  require(w >= 1, s"window w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_winnow_fingerprints requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      Md5WinnowFingerprints.fingerprints(v.asInstanceOf[UTF8String].toString, k, w)
        .map(UTF8String.fromString))

  override def prettyName: String = "md5_winnow_fingerprints"

  override protected def withNewChildInternal(newChild: Expression): Md5WinnowFingerprints =
    copy(child = newChild)
}

object Md5WinnowFingerprints {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Distinct window-minimum md5 fingerprints in first-seen order —
    * the exact value sequence of
    * `array_distinct(transform(..., j -> array_min(slice(kg, j, w))))`
    * over `kg = transform(..., i -> substring(md5(substring(t, i, k)), 1, 8))`.
    */
  def fingerprints(s: String, k: Int, w: Int): Array[String] = {
    // code-point offsets: Spark substring counts characters (code
    // points); a surrogate pair is ONE position
    val cpStarts = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < s.length) { b += i; i += Character.charCount(s.codePointAt(i)) }
      b += s.length
      b.toArray
    }
    val n = cpStarts.length - 1
    val nG = math.max(n - k + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = new Array[String](nG)
    var g = 0
    while (g < nG) {
      val from = cpStarts(g)
      val until = cpStarts(math.min(g + k, n))
      val bytes = md.digest(s.substring(from, until).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      // first 8 hex chars = first 4 digest bytes
      val cs = new Array[Char](8)
      var b = 0
      while (b < 4) {
        cs(2 * b) = HexDigits((bytes(b) >> 4) & 0xf)
        cs(2 * b + 1) = HexDigits(bytes(b) & 0xf)
        b += 1
      }
      h(g) = new String(cs)
      g += 1
    }
    // monotonic deque sliding min, lexicographic over the hex strings
    val deque = new Array[Int](nG)
    var head = 0
    var tail = 0
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j < nG) {
      while (tail > head && h(deque(tail - 1)).compareTo(h(j)) >= 0) tail -= 1
      deque(tail) = j; tail += 1
      while (deque(head) < j - w + 1) head += 1
      if (j >= w - 1 || j == nG - 1) seen.add(h(deque(head)))
      j += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Column API: oracle-mirrored md5 winnow fingerprints. */
  def of(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(Md5WinnowFingerprints(ColumnBridge.expression(c), k, w))
}

object WinnowFingerprints {

  /** FNV-ish odd multiplier for the rolling polynomial. */
  private val B = 0x100000001b3L

  /** murmur3 fmix64 finalizer: the raw polynomial is affine in the last
    * character, which would bias window-minimum selection toward
    * low-codepoint suffixes; the finalizer makes selection uniform.
    * Equal grams still map to equal fingerprints (it's a bijection).
    */
  private def fmix64(v: Long): Long = {
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Distinct window-minimum fingerprints of `s` (gram size k, window w),
    * in first-seen order. A document shorter than k yields the hash of
    * the whole text (mirroring `substring(t, i, k)`'s truncated gram).
    */
  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.length
    val nG = math.max(n - k + 1, 1)
    val h = new Array[Long](nG)
    val kEff = math.min(k, n)
    var raw = 0L
    var i = 0
    while (i < kEff) { raw = raw * B + s.charAt(i); i += 1 }
    h(0) = fmix64(raw)
    if (nG > 1) {
      var pow = 1L
      i = 0
      while (i < k - 1) { pow *= B; i += 1 }
      var j = 1
      while (j < nG) {
        raw = (raw - s.charAt(j - 1) * pow) * B + s.charAt(j + k - 1)
        h(j) = fmix64(raw)
        j += 1
      }
    }
    // monotonic-deque sliding minimum: deque holds indices with
    // increasing hash; head is the current window's minimum
    val deque = new Array[Int](nG)
    var head = 0
    var tail = 0
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nG) {
      while (tail > head && h(deque(tail - 1)) >= h(j)) tail -= 1
      deque(tail) = j; tail += 1
      while (deque(head) < j - w + 1) head += 1
      // full windows end at j >= w-1; a document with fewer than w grams
      // has exactly one (clamped) window covering everything
      if (j >= w - 1 || j == nG - 1) seen.add(h(deque(head)))
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    out
  }

  /** Column API: distinct winnowed fingerprints of a string column. */
  def of(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
}
