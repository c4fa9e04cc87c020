package graft

import graft.functions.VectorDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native functions for the SQL
  * surface (`spark.sql("... vector_dot(a, b) ...")`).
  *
  * Install via config on any deployment (no code changes):
  *   spark.sql.extensions=graft.GraftExtensions
  * `SparkEnv.session` applies it automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vectorDot)
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
}
