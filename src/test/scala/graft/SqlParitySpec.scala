package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** SQL-string parity: the engine's primary API is the DataFrame DSL, but a
  * user must also be able to paste plain ANSI SQL at `spark.sql` over the
  * registered tables and get the same answers. Each query below runs its
  * DuckDB oracle string VERBATIM through Spark SQL and must match the DSL
  * result — pinning both that the SQL dialect surface works and that the
  * DSL plans implement the same semantics the SQL strings declare.
  */
class SqlParitySpec extends AnyFunSuite {
  import SparkTestEnv._

  // dialect-portable (pure ANSI) oracle strings, one per operator family:
  // agg/filter, 3-way join, sort/limit, rollup, conditional agg, having,
  // set op, window subquery
  private val portable = Seq(
    "q01_pricing_summary",
    "q03_segment_revenue",
    "q09_top_orders",
    "q11_rollup_qty",
    "q19_conditional_agg",
    "q20_having_frequent",
    "q13_intersect_custkeys",
    "q21_above_brand_avg",
    // correlated subqueries run in their CORRELATED form here — Spark's
    // own decorrelation must agree with the engine's hand-decorrelated
    // DSL plans
    "q91_correlated_scalar",
    "q92_exists_late_ship")

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map {
        case null => "NULL"
        case d: Double => String.format("%.6g", Double.box(d))
        case x => x.toString
      }.mkString("|"))
      .sorted
  }

  test("oracle SQL strings run verbatim through spark.sql and match the DSL") {
    Tables.registerAll(spark, sf)
    portable.foreach { name =>
      val sqlResult = spark.sql(SparkEntry.oracleSql(name))
      val dslResult = SparkEntry.queries(name)(spark, sf)
      assert(sqlResult.columns.sorted.toSeq == dslResult.columns.sorted.toSeq,
        s"$name: column sets differ")
      assert(canon(sqlResult) == canon(dslResult), s"$name: results differ")
    }
  }
}
