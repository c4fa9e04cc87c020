package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) lookup for product quantization: given a
  * corpus row's `codes` (m subvector codebook ids) and a query's
  * flattened lookup table `lut` (m·k doubles — `lut[b*k + c]` = dot of
  * the query's b-th subvector with centroid c of block b), returns
  * `Σ_b lut[b*k + codes[b]]` ≈ dot(query, corpus vector).
  *
  * Why a custom Expression (same rationale as [[VectorDot]]): the HOF
  * form `aggregate(transform(codes, (c, i) -> element_at(lut, i*k+c+1)),
  * 0d, (a, v) -> a+v)` is interpreted per element and breaks whole-stage
  * codegen on the |corpus|×|queries| scoring path — the single hottest
  * loop of PQ search. This compiles to a primitive gather loop.
  *
  * Null/shape semantics: null if either input is null, or if
  * `codes.numElements * k != lut.numElements` (a mismatched model —
  * scoring with a partial table would silently mis-rank), or if any code
  * falls outside [0, k).
  */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (codesOk && lutOk && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<integral> codes, array<double> lut, k>0), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}, k=$k")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def codeType: DataType = left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m * k != lut.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < m) {
      val c = codeType match {
        case ByteType => codes.getByte(i).toInt
        case ShortType => codes.getShort(i).toInt
        case IntegerType => codes.getInt(i)
        case other => throw new IllegalStateException(s"unsupported code type $other")
      }
      if (c < 0 || c >= k) return null
      acc += lut.getDouble(i * k + c)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      val cv = CodeGenerator.getValue(codes, codeType, i)
      s"""
         |int $m = $codes.numElements();
         |if ($m * $k != $lut.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
         |    int $c = (int) $cv;
         |    if ($c < 0 || $c >= $k) { ${ev.isNull} = true; }
         |    else { $acc += $lut.getDouble($i * $k + $c); }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

object PqAdc {
  /** Column API: ADC score of `codes` against a flat `lut` with k
    * centroids per block.
    */
  def score(codes: Column, lut: Column, k: Int): Column =
    ColumnBridge.column(
      PqAdc(ColumnBridge.expression(codes), ColumnBridge.expression(lut), k))
}
