package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dense matrix × vector against a LITERAL matrix: `rows` dot products of
  * the input array with the rows of a flat row-major `double[]` embedded
  * as a codegen reference object — the rotation step of OPQ encoding
  * ([[graft.operators.OpqAnn]]) applied to every corpus row.
  *
  * Why a custom Expression (same rationale as [[HyperplaneBands]], which
  * is this loop plus sign-bit packing): composing d output dims from d
  * per-row `VectorDot` Columns explodes the plan and re-reads the input
  * array d times through Catalyst glue; the HOF
  * `transform(sequence(...), aggregate(...))` form is interpreted per
  * element. This compiles to one tight primitive loop.
  */
case class MatVec(
    child: Expression,
    matrix: Array[Double], // flat rows × dim, row-major
    rows: Int,
    dim: Int)
    extends UnaryExpression {

  require(matrix.length == rows * dim, s"matrix length ${matrix.length} != $rows*$dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    // dimension mismatch → null, like VectorDot: a partially-rotated
    // vector would silently corrupt every downstream code
    if (vec.numElements() != dim) return null
    val isFloat = elemType == FloatType
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      val base = r * dim
      var d = 0
      while (d < dim) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        acc += x * matrix(base + d)
        d += 1
      }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, vec => {
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val xv = CodeGenerator.getValue(vec, elemType, d)
      s"""
         |if ($vec.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$rows];
         |  for (int $r = 0; $r < $rows; $r++) {
         |    double $acc = 0.0;
         |    int $base = $r * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += ((double) $xv) * $matRef[$base + $d];
         |    }
         |    $out[$r] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

object MatVec {
  /** Column API: `matrix` (rows × dim, as nested rows) times `vec`. */
  def apply(vec: Column, matrix: Array[Array[Double]]): Column = {
    require(matrix.nonEmpty, "matrix must have rows")
    val dim = matrix.head.length
    require(matrix.forall(_.length == dim), "ragged matrix")
    ColumnBridge.column(
      MatVec(ColumnBridge.expression(vec), matrix.flatten, matrix.length, dim))
  }
}
