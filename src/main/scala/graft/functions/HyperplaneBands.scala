package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Banded random-hyperplane signature of an embedding: for each of `bands`
  * bands, the `rowsPerBand` sign bits of the vector's dot products with
  * that band's hyperplanes, packed into one long. Two vectors are LSH
  * candidates iff they agree on ALL bits of at least one band — the
  * classic AND-OR amplification (banding) used by the MinHash dedup path,
  * here over sign-random-projection bits (Charikar's SRP: P[bit agree] =
  * 1 - angle/π).
  *
  * Why a custom Expression: a signature is `bands × rowsPerBand` dot
  * products per row (e.g. 160 × 7 = 1120 for the near-dup defaults).
  * Building that from per-bit Column expressions explodes the Catalyst
  * plan (one `when(dot > 0)` tree per bit) and falls out of whole-stage
  * codegen; this compiles to one tight primitive loop over a flat
  * `double[]` plane matrix embedded as a codegen reference object.
  */
case class HyperplaneBands(
    child: Expression,
    planes: Array[Double], // flat (bands*rowsPerBand) × dim, row-major
    bands: Int,
    rowsPerBand: Int,
    dim: Int)
    extends UnaryExpression {

  require(planes.length == bands * rowsPerBand * dim,
    s"planes length ${planes.length} != $bands*$rowsPerBand*$dim")
  require(rowsPerBand > 0 && rowsPerBand <= 64, "band keys are packed into a long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    // dimension mismatch → null, like VectorDot: a partial signature would
    // silently bucket corrupt embeddings instead of surfacing them
    if (vec.numElements() != dim) return null
    val isFloat = elemType == FloatType
    val keys = new Array[Long](bands)
    var p = 0
    while (p < bands * rowsPerBand) {
      var acc = 0.0
      val base = p * dim
      var d = 0
      while (d < dim) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        acc += x * planes(base + d)
        d += 1
      }
      if (acc > 0) keys(p / rowsPerBand) |= 1L << (p % rowsPerBand)
      p += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, vec => {
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val keys = ctx.freshName("keys")
      val xv = CodeGenerator.getValue(vec, elemType, d)
      s"""
         |if ($vec.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $keys = new long[$bands];
         |  for (int $p = 0; $p < ${bands * rowsPerBand}; $p++) {
         |    double $acc = 0.0;
         |    int $base = $p * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += ((double) $xv) * $planesRef[$base + $d];
         |    }
         |    if ($acc > 0) $keys[$p / $rowsPerBand] |= 1L << ($p % $rowsPerBand);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

/** Multi-probe band keys for the QUERY side of LSH top-k (Lv et al.,
  * VLDB'07): per band, the exact bucket followed by `probes − 1`
  * perturbed buckets — the single-bit flips of every bit plus the 2-bit
  * flips of the four weakest bits, ordered by total flipped margin
  * |dot| (+ |dot|), so probe j is always the j-th most plausible
  * alternative bucket. Output is one flat `array<long>` of
  * `bands × probes` buckets in (band-major, probe) order; `posexplode`
  * recovers the band as `pos / probes`.
  *
  * Why a custom Expression: building this from Column combinators
  * requires materializing the sort ORDER as expressions —
  * `element_at(array_sort(...), j)` per probe, each re-embedding the
  * per-bit dot products and the whole sort pipeline — which multiplies
  * into thousands of Catalyst nodes (measured: the q38 shape, 8 tables ×
  * 4 bits × 2 probes, spent ~4 s per run in analysis/codegen of that
  * tree, and deeper probing scaled with the TREE, not the data — 28 s at
  * probes=8 over a 2000-row corpus). Here the dots are computed once and
  * the sequence sorted in a tight per-row loop; semantics are identical
  * (same planes, same margin ordering, same tie-break by mask).
  */
case class MultiProbeBandKeys(
    child: Expression,
    planes: Array[Double], // flat (bands*rowsPerBand) × dim, row-major
    bands: Int,
    rowsPerBand: Int,
    dim: Int,
    probes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(planes.length == bands * rowsPerBand * dim,
    s"planes length ${planes.length} != $bands*$rowsPerBand*$dim")
  require(rowsPerBand > 0 && rowsPerBand <= 64, "band keys are packed into a long")
  private val pairFlips = { val w = math.min(rowsPerBand, 4); w * (w - 1) / 2 }
  require(probes >= 1 && probes <= rowsPerBand + pairFlips + 1,
    s"probes: 1 + at most $rowsPerBand single flips + $pairFlips two-bit flips")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_probe_band_keys requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    if (vec.numElements() != dim) return null
    val isFloat = elemType == FloatType
    val out = new Array[Long](bands * probes)
    val dots = new Array[Double](rowsPerBand)
    var t = 0
    while (t < bands) {
      var bucket = 0L
      var i = 0
      while (i < rowsPerBand) {
        var acc = 0.0
        val base = (t * rowsPerBand + i) * dim
        var d = 0
        while (d < dim) {
          val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          acc += x * planes(base + d)
          d += 1
        }
        dots(i) = acc
        if (acc > 0) bucket |= 1L << i
        i += 1
      }
      out(t * probes) = bucket
      if (probes > 1) {
        // singles sorted by (|dot|, mask) — the Column form's
        // array_sort over struct(a, m) with the same tie-break
        val singles = Array.tabulate(rowsPerBand)(i => (math.abs(dots(i)), 1L << i))
          .sortBy(identity)
        val w = math.min(rowsPerBand, 4)
        val pairs = for {
          i <- 0 until w
          j <- i + 1 until w
        } yield (singles(i)._1 + singles(j)._1, singles(i)._2 ^ singles(j)._2)
        val sequence = (singles ++ pairs).sortBy(identity)
        var j = 1
        while (j < probes) {
          out(t * probes + j) = bucket ^ sequence(j - 1)._2
          j += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "multi_probe_band_keys"

  override protected def withNewChildInternal(newChild: Expression): MultiProbeBandKeys =
    copy(child = newChild)
}

object HyperplaneBands {
  /** Column API: array of `bands` packed band keys for `vec`. `planes` is
    * (bands*rowsPerBand) rows × dim, as produced by [[graft.operators.Similarity.planes]].
    */
  def bandKeys(vec: Column, planes: Array[Array[Double]], bands: Int, rowsPerBand: Int): Column = {
    require(planes.nonEmpty && planes.length == bands * rowsPerBand)
    val dim = planes.head.length
    ColumnBridge.column(
      HyperplaneBands(ColumnBridge.expression(vec), planes.flatten, bands, rowsPerBand, dim))
  }

  /** Column API: `bands × probes` multi-probe buckets in (band-major,
    * probe) order; band = `pos / probes` after `posexplode`.
    */
  def probeKeys(vec: Column, planes: Array[Array[Double]], bands: Int,
      rowsPerBand: Int, probes: Int): Column = {
    require(planes.nonEmpty && planes.length == bands * rowsPerBand)
    val dim = planes.head.length
    ColumnBridge.column(MultiProbeBandKeys(
      ColumnBridge.expression(vec), planes.flatten, bands, rowsPerBand, dim, probes))
  }
}
