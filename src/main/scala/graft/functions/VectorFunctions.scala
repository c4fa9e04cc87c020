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
}
