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
    * through `pattern` — one output file per partition directory UNLESS
    * the directory's data exceeds `targetBytes`, in which case it splits
    * into ⌈bytes/target⌉ files (the reference hardcoded one file per day,
    * HDFSMerge.java:142 — fine at its scale, but a hot day at 100 TB would
    * funnel the whole partition through a single reducer and produce one
    * multi-TB file).
    *
    * Splitting works by salting the repartition key inside oversized
    * leaves: leaf sizes are estimated from one column-pruned count pass
    * (rows × input bytes/row), each row gets a DETERMINISTIC salt
    * `xxhash64(_metadata.file_path, _metadata.row_index) mod splits(leaf)`
    * — deterministic so a shuffle-retry re-producing a map task lands
    * every row in the same bucket (`rand()` could duplicate or drop rows
    * under retry), and position-based so duplicate rows still spread
    * across buckets — and the write still `partitionBy`s only the real
    * partition columns, so the layout is unchanged; the leaf just holds
    * `splits` files.
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
      subPart: Option[Migrate.SubPart] = None,
      srcFormat: String = "parquet",
      srcOptions: Map[String, String] = Map.empty): Stats = {

    val (nFiles, nBytes) = pathStats(spark, srcPath)
    val df0 = Migrate.read(spark, srcPath, srcFormat, srcOptions)
      .withColumn(partName, date_format(col(partKeyCol), pattern))
    val df = subPart.fold(df0)(sp => df0.withColumn(sp.name, sp.value))
    val partNames = partName +: subPart.map(_.name).toSeq
    val partCols = partNames.map(col)

    // per-leaf split counts from ONE column-pruned count pass, collected -
    // the result is bounded by the partition count (the reference's own
    // driver granularity). If the WHOLE input fits the target, no leaf can
    // be oversized - skip the pass entirely (the common small-compaction
    // fast path). Partition values are strings by construction
    // (date_format / SubPart.value), so they join back losslessly.
    val splitRows: Array[org.apache.spark.sql.Row] =
      if (nBytes <= targetBytes) Array.empty
      else {
        val leafRows = df.groupBy(partCols: _*).agg(count(lit(1)).as("__rows")).collect()
        val totalRows = math.max(1L, leafRows.map(_.getLong(partNames.length)).sum)
        val bytesPerRow = nBytes.toDouble / totalRows
        leafRows.map { r =>
          val splits = math.max(1L,
            math.ceil(r.getLong(partNames.length) * bytesPerRow / targetBytes).toLong)
          org.apache.spark.sql.Row.fromSeq(partNames.indices.map(r.get) :+ splits)
        }
      }

    // same key -> same task: one file per (leaf, salt); task count only
    // sets write parallelism beyond that
    val filesTotal = math.max(1L, nBytes / targetBytes)
      .max(spark.sparkContext.defaultParallelism.toLong)
      .min(Int.MaxValue.toLong) // a tiny targetBytes must clamp, not wrap negative
    val dataCols = df.columns.map(col)
    val keyed =
      if (!splitRows.exists(_.getLong(partNames.length) > 1))
        df.repartition(filesTotal.toInt, partCols: _*)
      else {
        // splits reach the rows via a BROADCAST join of the (bounded,
        // driver-built) per-leaf table - a hash lookup per row, not a
        // linear scan of a map literal. The salt hashes the row's source
        // POSITION (_metadata file path + row index), which is (a) stable
        // across task retries - rand() could duplicate/drop rows when a
        // map task re-runs - and (b) distinct for duplicate rows, so a
        // leaf full of identical rows (the dedup-tier norm) still spreads
        // across its salt buckets; hashing data columns would send every
        // duplicate to one reducer and also break on MapType columns.
        // renamed join keys + NULL-SAFE equality: a NULL partition value
        // (written as __HIVE_DEFAULT_PARTITION__) must keep its rows — a
        // plain inner equi-join would silently drop every NULL-key row
        val keyed = partNames.indices.map(i => s"__k$i")
        val schema = org.apache.spark.sql.types.StructType(
          df.select(partCols: _*).schema.fields.zip(keyed).map { case (f, n) => f.copy(name = n) } :+
            org.apache.spark.sql.types.StructField("__splits",
              org.apache.spark.sql.types.LongType, nullable = false))
        val splitsDf = spark.createDataFrame(
          spark.sparkContext.parallelize(splitRows.toIndexedSeq, 1), schema)
        val cond = partNames.zip(keyed)
          .map { case (p, k) => col(p) <=> col(k) }.reduce(_ && _)
        // row_index is parquet-only; other file sources fall back to
        // monotonically_increasing_id — row-unique, and stable here
        // because a DIRECT file scan plans its partitions (sorted file
        // list, fixed split sizes) deterministically, so a retried task
        // regenerates identical ids. (file_block_start would give every
        // row of a ~128 MB scan block the same salt, breaking sub-block
        // splitting for csv/json sources.)
        val rowPos =
          if (scala.util.Try(df.select(col("_metadata.row_index"))).isSuccess)
            col("_metadata.row_index")
          else monotonically_increasing_id()
        df.withColumn("__fp", col("_metadata.file_path"))
          .withColumn("__ri", rowPos)
          .join(broadcast(splitsDf), cond)
          .withColumn("__salt", pmod(xxhash64(col("__fp"), col("__ri")), col("__splits")))
          .repartition(filesTotal.toInt, (partCols :+ col("__salt")): _*)
          .select(dataCols.toIndexedSeq: _*)
      }
    keyed.write
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
