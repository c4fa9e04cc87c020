package graft

import graft.functions.VectorDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native functions for the SQL
  * surface (`spark.sql("... vector_dot(a, b) ...")`) and the
  * transparent-MV-routing optimizer rule ([[graft.sources.MvRoute]] —
  * inert until [[graft.operators.Mv.register]] names a view).
  *
  * Install via config on any deployment (no code changes):
  *   spark.sql.extensions=graft.GraftExtensions
  * `SparkEnv.session` applies it automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vectorDot)
    e.injectFunction(GraftExtensions.pqAdc)
    e.injectOptimizerRule(graft.sources.MvRoute.apply)
  }
}

object GraftExtensions {
  val vectorDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, null, "vector_dot",
      "vector_dot(a, b) - dot product of two float/double arrays, accumulated in double.",
      "", "", "", "", "", "", "scala_udf"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vector_dot takes exactly 2 arguments")
      VectorDot(children.head, children(1))
    })

  val pqAdc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_adc"),
    new ExpressionInfo(classOf[graft.functions.PqAdc].getName, null, "pq_adc",
      "pq_adc(codes, lut, k) - product-quantization ADC score: sum over blocks b " +
        "of lut[b*k + codes[b]]; k must be a literal.",
      "", "", "", "", "", "", "scala_udf"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "pq_adc takes exactly 3 arguments")
      val k = children(2) match {
        case e if e.foldable && (e.dataType match {
              case org.apache.spark.sql.types.ByteType |
                   org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.IntegerType |
                   org.apache.spark.sql.types.LongType => true
              case _ => false
            }) =>
          e.eval().toString.toInt
        case _ => throw new IllegalArgumentException("pq_adc: k must be an integer literal")
      }
      graft.functions.PqAdc(children.head, children(1), k)
    })
}
