package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training — the concat-and-chunk layout:
  * documents are concatenated in a fixed order and the token stream is
  * cut into fixed-length context windows, so every document owns a
  * global token offset and a span of chunk ids. The per-document spans
  * drive shard planning (which chunks a doc touches, how many docs a
  * chunk mixes) without materializing the token stream itself.
  *
  * The primitive underneath is an exclusive prefix sum in a total
  * order — which Spark's `Window.orderBy` computes on ONE reducer. At
  * 100 TB that's the classic scale-killer, so [[exclusivePrefixSum]]
  * implements the textbook distributed scan instead: explicit range
  * boundaries (approxQuantile, collected once), per-bucket partial sums
  * collected to the driver (bounded by `buckets`, not by rows),
  * broadcast back as bucket base offsets, and an in-bucket window. Three
  * linear passes, no single-reducer stage.
  */
object Packing {

  /** Adds column `out` = sum of `valueCol` over all rows strictly before
    * this one in ascending `orderCol` order. `orderCol` must be unique
    * (a total order) — with duplicates the "before" set is ambiguous.
    * Values are summed as longs.
    *
    * `bucketOn` is the numeric range-bucketing proxy — any expression
    * that is MONOTONE in `orderCol` (boundaries only place rows in
    * buckets; the in-bucket window still orders by `orderCol` itself).
    * It defaults to `orderCol` cast to double; pass an explicit proxy
    * when the order key isn't numeric (e.g. the first hex digits of an
    * md5 shuffle key, decoded to a long).
    */
  def exclusivePrefixSum(df: DataFrame, orderCol: Column, valueCol: Column,
      buckets: Int = 64, out: String = "offset",
      bucketOn: Option[Column] = None): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._

    val proxy = bucketOn.getOrElse(orderCol.cast("double"))
    val tagged = df.withColumn("__v", valueCol.cast("long"))
    // Explicit, driver-held range boundaries: bucket assignment becomes a
    // pure function of the proxy (deterministic across jobs/retries,
    // unlike spark_partition_id after a sampled repartitionByRange).
    val bounds: Array[Double] =
      if (buckets == 1) Array.empty
      else tagged.select(proxy.cast("double").as("__o"))
        .stat.approxQuantile("__o", (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
    val bucketExpr = bounds.distinct.sorted.foldLeft(lit(0)) { (acc, bd) =>
      acc + when(proxy.cast("double") > lit(bd), 1).otherwise(0)
    }
    val bucketed = tagged.withColumn("__b", bucketExpr)

    // Bounded collect: one row per bucket, never per data row.
    val totals: Map[Int, Long] = bucketed.groupBy("__b").agg(sum("__v").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ids = totals.keys.toSeq.sorted
    val base: Seq[(Int, Long)] = ids.zip(
      ids.scanLeft(0L)((acc, b) => acc + totals(b)).dropRight(1))
    val baseDf = broadcast(base.toDF("__b", "__base"))

    val win = Window.partitionBy("__b").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(baseDf, Seq("__b"), "left")
      .withColumn(out,
        coalesce(sum(col("__v")).over(win), lit(0L)) + coalesce(col("__base"), lit(0L)))
      .drop("__b", "__v", "__base")
  }

  /** Per-document chunk spans under context length `ctxLen`:
    * input columns plus (offset, first_chunk, last_chunk, n_chunks).
    * Zero-token rows must be filtered out by the caller (they occupy no
    * chunk). Offsets stay exact in doubles up to 2^53 tokens — beyond
    * any corpus measured in tokens today.
    */
  def chunkSpans(docs: DataFrame, ctxLen: Int,
      orderCol: Column, tokensCol: Column, buckets: Int = 64,
      bucketOn: Option[Column] = None): DataFrame = {
    require(ctxLen >= 1, s"ctxLen must be >= 1, got $ctxLen")
    val withOff = exclusivePrefixSum(docs, orderCol, tokensCol, buckets, bucketOn = bucketOn)
    val first = floor(col("offset") / ctxLen).cast("long")
    val last = floor((col("offset") + tokensCol - 1) / ctxLen).cast("long")
    withOff
      .withColumn("first_chunk", first)
      .withColumn("last_chunk", last)
      .withColumn("n_chunks", last - first + 1)
  }
}
