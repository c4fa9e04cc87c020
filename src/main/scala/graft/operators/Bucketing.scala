package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the storage-side answer to
  * "big fact ⋈ big fact" at 100 TB: both sides hash-clustered into the
  * same bucket count on the join key at *write* time, so the join needs no
  * shuffle at *read* time (Catalyst sees compatible `HashClusteredDistribution`
  * from the bucketed scan and plans a sort-merge join without exchanges).
  *
  * The reference's layout discipline (one directory per partition value)
  * solved pruning; bucketing is the same discipline one level down,
  * solving join placement. Pair with `partitionBy(date)` for both.
  */
object Bucketing {

  /** Save as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key (shuffle-free —
    * asserted by BucketingSpec against the executed plan).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
