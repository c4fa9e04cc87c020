package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.queries.*` modules as [[QueryDef]]s; this
  * object aggregates them into the driver's two maps.
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    q.Relational.entries ++
      q.Warehouse.entries ++
      q.Events.entries ++
      q.Ops.entries ++
      q.Text.entries ++
      q.Dedup.entries ++
      q.Vectors.entries ++
      q.Misc.entries ++
      q.Extras.entries ++
      q.Extras2.entries ++
      q.Extras3.entries ++
      q.Extras4.entries ++
      q.Extras5.entries ++
      q.Extras6.entries ++
      q.Extras7.entries ++
      q.Extras8.entries ++
      q.Extras9.entries ++
      q.Extras10.entries ++
      q.Extras11.entries ++
      q.Extras12.entries ++
      q.Extras13.entries ++
      q.Curation.entries

  {
    val dup = allQueries.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.entries.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
