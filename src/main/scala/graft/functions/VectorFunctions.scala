package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding math over `array<float>` columns, built from codegen'd
  * higher-order functions (`zip_with` + `aggregate`) — no UDF
  * serialization on the hot path. Folds run in array order, so results
  * are bit-deterministic for a given row (safe for oracle comparison).
  */
object VectorFunctions {

  /** Cast array<float> → array<double> for stable accumulation. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product of two equal-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two raw (unnormalized) vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  // ---- native (codegen'd) variants — same math bit-for-bit, ~10× faster
  // on the pair hot path; see [[VectorDot]] for why the HOF forms are slow.

  def fdot(a: Column, b: Column): Column = VectorDot.dot(a, b)
  def fnorm(a: Column): Column = sqrt(fdot(a, a))
  def fcosine(a: Column, b: Column): Column = fdot(a, b) / (fnorm(a) * fnorm(b))

  // ---- int8 quantization: 4× smaller embeddings on disk and through
  // every shuffle — at 100 TB the embedding table's byte volume, not its
  // FLOPs, is the bottleneck. Symmetric max-abs scheme: one float scale
  // per vector, values in [-127, 127].

  /** Per-vector quantization scale: max|x| / 127, clamped to a tiny
    * positive floor so division is always defined. An all-zero vector
    * quantizes to zeros and yields NaN cosine — exactly like the
    * full-precision path divides by a zero norm; filter degenerate
    * vectors upstream of either path.
    */
  def q8Scale(a: Column): Column =
    greatest(array_max(transform(a, x => abs(x))) / lit(127.0d), lit(1e-30d))

  /** Quantize to array<tinyint> under [[q8Scale]]. */
  def quantize8(a: Column, scale: Column): Column =
    transform(a, x => round(x.cast("double") / scale).cast("tinyint"))

  /** Dequantize back to array<float>. */
  def dequantize8(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))

  /** Cosine of two quantized vectors, computed from the int8 form alone:
    * the per-vector scales cancel (cos(s·q) is scale-invariant), so only
    * the tinyint arrays travel through the join — the scale column is
    * needed for dot/L2 reconstruction, never for cosine ranking.
    * [[VectorDot]] reads integral arrays natively (no per-pair casts).
    */
  def q8Cosine(qa: Column, qb: Column): Column =
    fdot(qa, qb) / (fnorm(qa) * fnorm(qb))
}
