package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two numeric arrays (float, double, or
  * any integral element — tinyint arrays are the int8-quantized embedding
  * form), accumulating in double in array order.
  *
  * Why a custom Expression: Spark's higher-order functions (`zip_with` +
  * `aggregate`) evaluate interpreted — per element they allocate lambda
  * variables and box values, and they break whole-stage codegen for the
  * surrounding operator. On the similarity hot path (millions of pairs ×
  * 64 floats) that interpretation dominates the runtime (~10× measured at
  * sf0.1). This expression compiles to a tight primitive loop inside the
  * generated code, keeping the whole pipeline in one codegen stage.
  *
  * Semantics match `aggregate(zip_with(a, b, (x, y) -> double(x) *
  * double(y)), 0d, (acc, v) -> acc + v)` bit-for-bit: products and the
  * running sum are computed in double, left-to-right.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(_: DecimalType, _) => false // no primitive accessor
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires numeric array inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch → null (the zip_with+aggregate reference semantics);
    // silently truncating would score corrupt/mixed-dimension embeddings
    // with a plausible partial dot product and mask the data problem
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    def read(d: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => d.getFloat(i).toDouble
      case DoubleType => d.getDouble(i)
      case ByteType => d.getByte(i).toDouble
      case ShortType => d.getShort(i).toDouble
      case IntegerType => d.getInt(i).toDouble
      case LongType => d.getLong(i).toDouble
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }
    val lt = elemType(left); val rt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += read(x, lt, i) * read(y, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = CodeGenerator.getValue(x, elemType(left), i)
      val yv = CodeGenerator.getValue(y, elemType(right), i)
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $xv) * ((double) $yv);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

object VectorDot {
  /** Column API: native dot product. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
