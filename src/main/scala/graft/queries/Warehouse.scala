package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-ops tier: the reference's partition math and verification,
  * row-level.
  *
  * - Partition range enumeration (CommonUtils.java:151-163): a day sequence
  *   formatted through a partition pattern, deduped and sorted — here via
  *   `sequence()` + `date_format()` + `distinct()`, no driver loop.
  * - Per-day manifest (CommonUtils.java:99-124 checkFile): counts + sums per
  *   partition key. The reference compared file name+length; the row-level
  *   generalization compares row counts and column checksums per partition.
  */
object Warehouse {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val entries: Seq[QueryDef] = Seq(

    // sequence(start, end) formatted through the partition pattern, dedup'd:
    // exactly CommonUtils.listPartitions with -pp yyyyMM.
    QueryDef.checked(
      "q22_partition_enum",
      """SELECT DISTINCT strftime(g.generate_series, '%Y%m') AS partition_value
        |FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-06-30',
        |                     INTERVAL 1 DAY) g""".stripMargin) { (s, dir) =>
      s.range(1)
        .select(explode(expr(
          "sequence(to_date('1995-01-01'), to_date('1995-06-30'), interval 1 day)")).as("d"))
        .select(date_format(col("d"), "yyyyMM").as("partition_value"))
        .distinct()
    },

    // per-day partition manifest over a date range: row-level checkFile.
    QueryDef.checked(
      "q23_day_manifest",
      """SELECT strftime(l_shipdate, '%Y%m%d') AS day_key,
        |  count(*) AS n_rows,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_key
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(date_format(col("l_shipdate"), "yyyyMMdd").as("day_key"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_orderkey")).as("sum_key"))
    }
  )
}
