package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the runtime-filter
  * primitive behind [[graft.operators.BloomPrune]]: a kilobytes-to-
  * megabytes summary of the build side's join keys, applied to the probe
  * side BEFORE its shuffle, so rows that cannot possibly match never
  * leave the scan stage.
  *
  * May return true for a key not in the build set (the classic Bloom
  * false positive, rate set at build time) but NEVER false for a present
  * key — callers follow with an exact join, so query results are
  * bit-identical to the unpruned plan.
  *
  * Why a custom Expression: Spark exposes no public might-contain
  * function (its own runtime bloom filters live behind an optimizer rule
  * and internal expressions), and a Scala UDF here would box every key
  * and break whole-stage codegen exactly on the hot scan this filter
  * exists to keep cheap. The filter object rides the plan's reference
  * array, which Spark ships to executors once per stage inside the
  * broadcast task binary — not once per row or per task.
  *
  * Accepts LONG keys (probed via `mightContainLong`) and STRING keys
  * (probed via `mightContainBinary` over the UTF-8 bytes — the exact
  * bytes `DataFrameStatFunctions.bloomFilter` hashed on the build side).
  * NULL in → NULL out (standard null-safe scalar semantics); callers
  * decide the NULL policy with `coalesce` — see [[graft.operators.BloomPrune]],
  * where a NULL key is non-matching for semi and kept for anti.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint or string key (cast upstream), got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType   => filter.mightContainLong(v.asInstanceOf[Long])
    case StringType => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, x => s"$ref.mightContainLong($x)")
      case StringType =>
        defineCodeGen(ctx, ev, x => s"$ref.mightContainBinary($x.getBytes())")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(c: Column, filter: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), filter))
}
