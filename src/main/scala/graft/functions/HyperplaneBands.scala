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
}
