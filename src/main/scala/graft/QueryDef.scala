package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Column names must agree
  * between the two — the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.matches("[a-z0-9_]+"), s"query name must be snake_case: $name")
}

object QueryDef {
  def checked(name: String, sql: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(sql))

  /** Rows-only check by the driver (no SQL-expressible oracle). */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
