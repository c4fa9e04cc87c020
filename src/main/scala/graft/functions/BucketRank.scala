package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd bucket rank against a literal sorted boundary array: the
  * count of boundaries ≤ value (an upper-bound binary search), used by
  * [[graft.operators.ZOrder]] to map a column value to its quantile
  * bucket in [0, 2^bits − 1].
  *
  * Why a custom Expression: the straightforward
  * `size(filter(typedLit(boundaries), b => b <= x))` evaluates the
  * higher-order function INTERPRETED — per row it walks all 2^bits − 1
  * boundaries through a lambda variable, boxing every element, and
  * breaks whole-stage codegen for the surrounding operator. Inside a
  * compaction rewrite the z-value is evaluated twice per row (range-
  * partitioner sampling + the write-side sort), which made the curve
  * expression dominate the entire rewrite (~60 s of a 66 s q101 at
  * sf0.1). This compiles to an O(log n) primitive binary search — the
  * same interpreted-HOF trap, and fix, as [[VectorDot]].
  *
  * Semantics match the filter+size form exactly, including duplicate
  * boundaries (upper bound counts ALL duplicates ≤ x) and SQL's NaN
  * ordering (NaN sorts above every double, so every boundary counts).
  * NULL in → NULL out; callers that want the ZOrder convention (NULLs in
  * the lowest bucket) coalesce to 0.
  */
case class BucketRank(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  require(boundaries.nonEmpty, "boundaries must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket_rank requires a double input (cast upstream), got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (java.lang.Double.isNaN(x)) return boundaries.length
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bndsRef = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |if (Double.isNaN($x)) {
         |  ${ev.value} = $bndsRef.length;
         |} else {
         |  int $lo = 0;
         |  int $hi = $bndsRef.length;
         |  while ($lo < $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    if ($bndsRef[$mid] <= $x) $lo = $mid + 1; else $hi = $mid;
         |  }
         |  ${ev.value} = $lo;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BucketRank =
    copy(child = newChild)
}

object BucketRank {
  /** Column API: upper-bound rank of `c` (cast to double) in `boundaries`
    * (must be sorted ascending).
    */
  def rank(c: Column, boundaries: Array[Double]): Column =
    ColumnBridge.column(BucketRank(
      ColumnBridge.expression(c.cast("double")), boundaries))
}
