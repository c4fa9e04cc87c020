package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-set math — the reference's driver-side date loops as
  * declarative plans.
  *
  * - `enumerate` ≡ `CommonUtils.listPartitions` (CommonUtils.java:151-163):
  *   every day in [start,end] formatted through the partition pattern,
  *   deduplicated and sorted (the reference's `TreeSet`).
  * - `discover` ≡ `TransWholeTablePartition.listAllPartitions`
  *   (TransWholeTablePartition.java:158-165): the distinct partition values
  *   that actually exist in a dataset.
  * - `dayMap` ≡ `CommonUtils.listPartitionsToDate` (CommonUtils.java:192-208):
  *   coarse partition → contained days; derived from one `sequence()` rather
  *   than a substring-containment join.
  *
  * All run as Spark jobs — no driver-side loops — so they hold at any range
  * size, and partition-value DataFrames can drive pruning predicates.
  */
object Partitions {

  /** Days in [start, end] (inclusive, `yyyy-MM-dd`) formatted through
    * `pattern` (Spark datetime pattern, e.g. `yyyyMMdd`, `yyyyMM`), distinct.
    */
  def enumerate(spark: SparkSession, start: String, end: String, pattern: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))).as("d"))
      .select(date_format(col("d"), pattern).as("partition_value"))
      .distinct()

  /** Distinct values of `partCol` present in `df` — partition discovery. */
  def discover(df: DataFrame, partCol: String): DataFrame =
    df.select(col(partCol).as("partition_value")).distinct()

  /** (partition_value, day_key) pairs for [start, end]: which days fall in
    * which coarse partition. One generated sequence, two formats — no join.
    */
  def dayMap(spark: SparkSession, start: String, end: String,
      coarsePattern: String, dayPattern: String = "yyyyMMdd"): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))).as("d"))
      .select(
        date_format(col("d"), coarsePattern).as("partition_value"),
        date_format(col("d"), dayPattern).as("day_key"))
      .distinct()
}
