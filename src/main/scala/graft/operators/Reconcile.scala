package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-copy verification — the row-level generalization of
  * `CommonUtils.checkFile` (CommonUtils.java:99-124), which compared file
  * counts, names and lengths between source and destination trees and
  * emailed on mismatch.
  *
  * Here a *manifest* is a per-partition (row count, order-independent
  * checksum) pair; reconciliation is a full-outer join of two manifests
  * (the reference's name→length map compare, CommonUtils.java:107-121).
  * `sum(xxhash64(struct(*)))` is commutative, so the checksum is stable
  * under any row order / partitioning — safe at 100 TB where row order is
  * never deterministic.
  */
object Reconcile {

  /** Per-partition manifest of `df`: n_rows + content checksum. `partKey`
    * must be deterministic per row (e.g. `date_format(col("dt"),"yyyyMMdd")`).
    */
  def manifest(df: DataFrame, partKey: Column): DataFrame = {
    val dataCols = df.columns.map(col).toIndexedSeq
    df.groupBy(partKey.as("par_key"))
      .agg(
        count(lit(1)).as("n_rows"),
        // decimal(38,0) sum: order-independent and overflow-proof (ANSI mode
        // would throw on long overflow after ~2 rows of extreme hashes)
        sum(xxhash64(dataCols: _*).cast("decimal(38,0)")).as("checksum"))
  }

  /** Full-outer manifest compare. Status per partition:
    * ok | missing_in_dest | missing_in_src | count_mismatch | checksum_mismatch
    * — the row-level analogues of the reference's "缺少文件"/length-mismatch
    * alerts (CommonUtils.java:102-121).
    */
  def diff(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.select(col("par_key"), col("n_rows").as("src_rows"), col("checksum").as("src_sum"))
    val d = dst.select(col("par_key"), col("n_rows").as("dst_rows"), col("checksum").as("dst_sum"))
    s.join(d, Seq("par_key"), "full_outer")
      .withColumn("status",
        when(col("dst_rows").isNull, lit("missing_in_dest"))
          .when(col("src_rows").isNull, lit("missing_in_src"))
          .when(col("src_rows") =!= col("dst_rows"), lit("count_mismatch"))
          .when(col("src_sum") =!= col("dst_sum"), lit("checksum_mismatch"))
          .otherwise(lit("ok")))
  }

  /** True iff every partition reconciles clean. Aggregates to one row —
    * driver-safe at any scale.
    */
  def isClean(src: DataFrame, dst: DataFrame): Boolean =
    diff(src, dst).filter(col("status") =!= "ok").isEmpty
}
