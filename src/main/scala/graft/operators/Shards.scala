package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard export — the last step of the pipeline: a curated
  * corpus becomes numbered, fixed-size, internally-sorted shard files
  * whose key ranges are disjoint, so a trainer (or a downstream Spark
  * job) can address "shard 1234" and data-skip everything else.
  *
  * `assign` computes the shard id from the row's GLOBAL RANK in a total
  * order — rank comes from [[Packing.exclusivePrefixSum]] with weight 1
  * (the distributed scan: three linear passes, no single-reducer global
  * window), so shard sizes are EXACT (every shard has `shardSize` rows,
  * except the last) and deterministic, where `repartitionByRange` alone
  * would give sample-estimated, run-to-run-varying cuts.
  *
  * `write` shuffles once on the shard id and writes one directory per
  * shard, rows sorted by the order key inside each file. One writer task
  * per shard is the DESIGN here, not a skew bug: `shardSize` bounds the
  * task's rows by construction (pick shardSize = target file size; a hot
  * key can't inflate a shard the way it inflates a date partition).
  */
object Shards {

  /** df + (rank, shard): rank = 0-based position in ascending `orderCol`
    * (which must be a total order — see [[Packing.exclusivePrefixSum]]),
    * shard = rank / shardSize. `bucketOn` as in the prefix sum (numeric
    * proxy for non-numeric order keys).
    */
  def assign(df: DataFrame, orderCol: Column, shardSize: Long,
      buckets: Int = 64, bucketOn: Option[Column] = None): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    Packing.exclusivePrefixSum(df, orderCol, lit(1L), buckets, out = "rank",
        bucketOn = bucketOn)
      .withColumn("shard", floor(col("rank") / shardSize).cast("long"))
  }

  /** Per-shard manifest of an assigned frame: (shard, n_rows, min_key,
    * max_key) — the driver-readable shard index.
    */
  def manifest(assigned: DataFrame, orderCol: Column): DataFrame =
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(orderCol).as("min_key"), max(orderCol).as("max_key"))

  /** Write `df` as numbered sorted shards under `path` (`shard=N`
    * directories, snappy parquet): one shuffle on the shard id, rows
    * sorted by `orderCol` within each file. Returns the shard count.
    */
  def write(df: DataFrame, path: String, orderCol: Column, shardSize: Long,
      buckets: Int = 64, bucketOn: Option[Column] = None): Long = {
    val assigned = assign(df, orderCol, shardSize, buckets, bucketOn)
    val nShards = assigned.agg(max(col("shard"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0) + 1
    }
    if (nShards > 0)
      assigned.drop("rank")
        .repartition(nShards.toInt, col("shard"))
        .sortWithinPartitions(col("shard"), orderCol)
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    nShards
  }

  /** Write `df` as JSON-Lines shards — the training-data interchange
    * format most tokenizer/trainer stacks read directly: `shard=N`
    * directories of text files, one JSON object per line, rows sorted by
    * `orderCol` inside each file. Same exact-size rank sharding as
    * [[write]]; every column lands in the object (`to_json(struct(*))`
    * — codegen'd, newline/quote escaping per RFC 8259, so embedded
    * newlines in text can never break the line framing). NULL cells are
    * emitted as explicit JSON nulls — to_json's default drops null
    * fields, which would make key-presence-sensitive JSONL consumers see
    * a ragged schema. Returns the shard count.
    */
  def writeJsonl(df: DataFrame, path: String, orderCol: Column, shardSize: Long,
      buckets: Int = 64, bucketOn: Option[Column] = None): Long = {
    val assigned = assign(df, orderCol, shardSize, buckets, bucketOn)
    val nShards = assigned.agg(max(col("shard"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0) + 1
    }
    if (nShards > 0)
      assigned
        .repartition(nShards.toInt, col("shard"))
        .sortWithinPartitions(col("shard"), orderCol)
        .select(col("shard"),
          to_json(struct(df.columns.map(col).toIndexedSeq: _*),
            Map("ignoreNullFields" -> "false")).as("value"))
        .write.mode("overwrite").partitionBy("shard").text(path)
    nShards
  }
}
