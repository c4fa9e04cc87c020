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
  * and the multiset of rows is preserved by construction. Destination
  * leaves that are ALREADY compact — file count ≤ ⌈leaf bytes/target⌉ —
  * are skipped (`skipCompacted`), the row-level analogue of the
  * reference's skip-`.snappy` filter (HDFSMerge.java:166): re-compacting
  * an already-compact destination rewrites nothing.
  */
object Compact {

  final case class Stats(filesBefore: Long, bytesBefore: Long, filesAfter: Long,
      leavesSkipped: Long = 0)

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
    *
    * `skipCompacted` (the reference's skip-`.snappy` semantics): a
    * destination leaf whose file count is already ≤ ⌈its bytes/target⌉ is
    * left untouched — its source rows are excluded from the rewrite and
    * the write switches to dynamic partition overwrite so the skipped
    * files (and their mtimes) survive. Skipping assumes the destination
    * leaf IS a prior compaction of the same source (exactly as the
    * reference assumed a `.snappy` file was its own prior output); pass
    * `skipCompacted = false` to force a full rewrite after the source
    * changed in place. Note dynamic overwrite also keeps destination
    * leaves absent from the source; the full-rewrite path truncates them.
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
      srcOptions: Map[String, String] = Map.empty,
      skipCompacted: Boolean = true,
      clusterBy: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil): Stats = {
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "clusterBy and zorderBy are alternative layouts — pass one")
    require(zorderBy.isEmpty || zorderBy.size >= 2,
      "zorderBy needs >= 2 columns (use clusterBy for a single column)")

    val (nFiles, nBytes) = pathStats(spark, srcPath)
    val dfAll0 = Migrate.read(spark, srcPath, srcFormat, srcOptions)
      .withColumn(partName, date_format(col(partKeyCol), pattern))
    val dfAll = subPart.fold(dfAll0)(sp => dfAll0.withColumn(sp.name, sp.value))
    val partNames = partName +: subPart.map(_.name).toSeq
    val partCols = partNames.map(col)

    // already-compact destination leaves: driver-side walk, bounded by the
    // partition count (the same granularity as existingPartitions)
    val skipLeaves: Seq[Seq[String]] =
      if (!skipCompacted) Seq.empty
      else Migrate.leafDirs(spark, destPath, partNames).map { case (fs, leaves) =>
        leaves.filter { case (_, dir) =>
          val files = fs.listStatus(dir).filter { st =>
            val n = st.getPath.getName
            st.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          val bytes = files.map(_.getLen).sum
          files.nonEmpty &&
            files.length <= math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
        }.map(_._1)
      }.getOrElse(Seq.empty)
    val df =
      if (skipLeaves.isEmpty) dfAll
      else {
        // anti-join on the (bounded, driver-built) skip list — null-safe,
        // __HIVE_DEFAULT_PARTITION__ comes back as null from leafDirs
        val keyed = partNames.indices.map(i => s"__s$i")
        val schema = org.apache.spark.sql.types.StructType(
          keyed.map(n => org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.StringType)))
        val skipDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            skipLeaves.map(vs => org.apache.spark.sql.Row.fromSeq(vs)), 1), schema)
        val cond = partNames.zip(keyed)
          .map { case (p, k) => col(p) <=> col(k) }.reduce(_ && _)
        dfAll.join(broadcast(skipDf), cond, "left_anti")
      }

    // same key -> same task: one file per (leaf, salt); task count only
    // sets write parallelism beyond that
    val filesTotal = math.max(1L, nBytes / targetBytes)
      .max(spark.sparkContext.defaultParallelism.toLong)
      .min(Int.MaxValue.toLong) // a tiny targetBytes must clamp, not wrap negative
    val dataCols = df.columns.map(col)

    if (zorderBy.nonEmpty) {
      // Z-ORDER layout: RANGE-partition on (partCols, zvalue) instead of
      // hash+salt — the range partitioner splits a hot leaf across tasks
      // by CONTIGUOUS z-range (the hash salt would deal each file a
      // random sample of the leaf, giving every file near-global min/max
      // and no skipping), then sort within each task so row groups are
      // tight too. Boundaries sample the pre-skip frame: one driver-held
      // quantile table per column, never a per-row join.
      val zExpr = ZOrder.curve(dfAll, zorderBy)
      df.repartitionByRange(filesTotal.toInt, (partCols :+ zExpr): _*)
        .sortWithinPartitions((partCols :+ zExpr): _*)
        .write
        .partitionBy(partNames: _*)
        .mode("overwrite")
        .option("partitionOverwriteMode", if (skipLeaves.nonEmpty) "dynamic" else "static")
        .parquet(destPath)
      val (outFiles, _) = pathStats(spark, destPath)
      return Stats(nFiles, nBytes, outFiles, skipLeaves.length.toLong)
    }

    val salted =
      if (nBytes <= targetBytes) None // whole input fits: no leaf can be oversized
      else {
        // fallback estimate only (file sources take the exact per-leaf
        // path inside leafSalted): bytes/row must be nBytes over the FULL
        // source row count — with skips in play `df` is a subset, and
        // nBytes/subsetRows would overestimate row width by the skip
        // ratio, over-splitting the rewritten leaves into exactly the
        // small files Compact exists to remove. The fallback count is
        // lazy: paid only if the _metadata probe fails.
        val bytesPerRow: Long => Double =
          if (skipLeaves.isEmpty) totalRows => nBytes.toDouble / totalRows
          else {
            lazy val fullRows = math.max(1L, dfAll.count())
            _ => nBytes.toDouble / fullRows
          }
        // fullDf: per-file row totals must include rows of SKIPPED leaves,
        // else a file straddling a skip boundary over-apportions its bytes
        // to the surviving leaves
        leafSalted(spark, df, partNames, targetBytes, bytesPerRow,
          fullDf = if (skipLeaves.isEmpty) None else Some(dfAll))
      }
    val keyed = salted match {
      case None => df.repartition(filesTotal.toInt, partCols: _*)
      case Some((s, _)) =>
        s.repartition(filesTotal.toInt, (partCols :+ col("__salt")): _*)
          .select(dataCols.toIndexedSeq: _*)
    }
    // clusterBy: sort INSIDE each writer task (no extra shuffle — the
    // repartition above fixed task ownership), so every output file is
    // ordered by the cluster columns and its parquet row-group min/max
    // stats become tight, disjoint ranges — selective scans skip row
    // groups instead of reading the leaf (the data-skipping layout the
    // statsManifest triage reads back). Compaction is exactly the moment
    // a 100 TB pipeline pays this sort: once, while rewriting anyway.
    // The sort MUST lead with the partition columns: the dynamic-
    // partition writer requires that prefix and would otherwise insert
    // its own (non-stable) par_key-only sort, destroying the clustering.
    val clustered =
      if (clusterBy.isEmpty) keyed
      else keyed.sortWithinPartitions((partCols ++ clusterBy.map(col)): _*)
    // with skips in play, dynamic overwrite replaces ONLY the rewritten
    // leaves — a static overwrite would truncate the skipped (already
    // compact) ones the skip just promised to keep
    clustered.write
      .partitionBy(partNames: _*)
      .mode("overwrite")
      .option("partitionOverwriteMode", if (skipLeaves.nonEmpty) "dynamic" else "static")
      .parquet(destPath)

    val (outFiles, _) = pathStats(spark, destPath)
    Stats(nFiles, nBytes, outFiles, skipLeaves.length.toLong)
  }

  /** Per-leaf size-split salt — shared by [[rewritePartitioned]] and
    * [[Migrate]]'s write path (the same one-reducer-per-hot-partition
    * hazard exists in both: `repartition(partCols)` funnels a hot
    * partition value through a single writer task and lands it as one
    * multi-TB file at 100 TB).
    *
    * Leaf sizes come from ONE metadata-augmented pass, collected — the
    * result is bounded by the partition count (the reference's own driver
    * granularity). When the plan exposes `_metadata` (any file source),
    * each source file's on-disk bytes are apportioned to leaves by the
    * file's row share — EXACT per-leaf bytes under within-file row-width
    * uniformity, so a leaf of atypically wide rows (sitting in its own
    * files, the incremental-write norm) splits correctly where a global
    * bytes/row figure would under-split it. `fullDf`, when given, supplies
    * the per-file row totals (Compact passes the pre-skip frame so a file
    * straddling skipped leaves isn't over-apportioned to the survivors).
    * `bytesPerRow` is the fallback for non-file children: it maps the
    * observed total row count to a global per-row byte estimate (Compact
    * derives it from the source directory's byte total; Migrate from
    * source stats computed upstream). Partition values are strings by
    * construction (date_format / SubPart.value), so they join back
    * losslessly.
    *
    * Returns `Some((df + "__salt", Σ splits))` when at least one leaf
    * exceeds `targetBytes` — each row of an oversized leaf gets a
    * deterministic salt in [0, splits(leaf)); callers repartition on
    * (partCols :+ __salt) with an EXPLICIT partition count (at least the
    * returned split total — an unpinned repartition lets AQE coalesce the
    * salt buckets back into one task per leaf, undoing the split) and
    * drop the column — or `None` when every leaf already fits (callers
    * keep their unsalted plan).
    */
  private[operators] def leafSalted(
      spark: SparkSession,
      df: DataFrame,
      partNames: Seq[String],
      targetBytes: Long,
      bytesPerRow: Long => Double,
      fullDf: Option[DataFrame] = None): Option[(DataFrame, Long)] = {
    val partCols = partNames.map(col)
    val hasMeta = scala.util.Try(
      df.select(col("_metadata.file_path"), col("_metadata.file_size"))).isSuccess
    // (leaf values, estimated leaf bytes)
    val leafBytes: Array[(Seq[Any], Double)] =
      if (hasMeta) {
        // exact file bytes, apportioned per leaf by row share within each
        // file: groupBy (file, leaf) then reduce — both aggregates are
        // metadata+key columns only, and the collect is leaf-bounded
        val perFileLeaf = df
          .groupBy((col("_metadata.file_path").as("__f") +: partCols): _*)
          .agg(count(lit(1)).as("__rows"), max(col("_metadata.file_size")).as("__fb"))
        val fileTotals = fullDf.getOrElse(df)
          .groupBy(col("_metadata.file_path").as("__f"))
          .agg(count(lit(1)).as("__frows"))
        perFileLeaf.join(fileTotals, "__f")
          .groupBy(partCols: _*)
          .agg(sum(col("__rows").cast("double") * col("__fb") / col("__frows"))
            .as("__bytes"))
          .collect()
          .map(r => (partNames.indices.map(r.get), r.getDouble(partNames.length)))
      } else {
        val leafRows = df.groupBy(partCols: _*).agg(count(lit(1)).as("__rows")).collect()
        val totalRows = math.max(1L, leafRows.map(_.getLong(partNames.length)).sum)
        val bpr = bytesPerRow(totalRows)
        leafRows.map(r =>
          (partNames.indices.map(r.get), r.getLong(partNames.length) * bpr))
      }
    val splitRows: Array[org.apache.spark.sql.Row] = leafBytes.map { case (vals, bytes) =>
      val splits = math.max(1L, math.ceil(bytes / targetBytes).toLong)
      org.apache.spark.sql.Row.fromSeq(vals :+ splits)
    }
    if (!splitRows.exists(_.getLong(partNames.length) > 1)) None
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
      // row_index is parquet-only, and _metadata does not survive every
      // plan shape (e.g. a non-file child); both probe-fail paths fall
      // back to monotonically_increasing_id — row-unique, and stable in
      // PRACTICE because a direct file scan plans its partitions (sorted
      // file list, fixed split sizes) deterministically; if listing order
      // or split confs changed between a task and its retry the ids could
      // differ, re-bucketing rows — under dynamic overwrite that is
      // file-size skew within the leaf, never loss or duplication.
      // (file_block_start would give every row of a ~128 MB scan block
      // the same salt, breaking sub-block splitting for csv/json sources.)
      val rowPos =
        if (scala.util.Try(df.select(col("_metadata.row_index"))).isSuccess)
          col("_metadata.row_index")
        else monotonically_increasing_id()
      val filePath =
        if (scala.util.Try(df.select(col("_metadata.file_path"))).isSuccess)
          col("_metadata.file_path")
        else lit("")
      val salted = df.withColumn("__fp", filePath)
        .withColumn("__ri", rowPos)
        .join(broadcast(splitsDf), cond)
        .withColumn("__salt", pmod(xxhash64(col("__fp"), col("__ri")), col("__splits")))
        .drop("__fp", "__ri")
      Some((salted, splitRows.map(_.getLong(partNames.length)).sum))
    }
  }

  /** In-place compaction — the reference's actual `HDFSMerge` shape (it
    * rewrote partitions inside the table directory, no `-distDB`,
    * README.md:20). Spark cannot overwrite a path it is reading, so the
    * rewrite stages to `<path>.graft-compact-tmp` and then swaps via two
    * renames (src → `.graft-compact-bak` → delete). The swap is NOT
    * atomic: a crash between the renames leaves the original intact
    * under `.graft-compact-bak` — recovery is `rename(bak, path)`, never
    * data loss. Readers racing the swap see the old or the new listing,
    * the same exposure the reference's delete-then-merge loop had
    * (HDFSMerge.java:174-189).
    */
  def rewriteInPlacePartitioned(
      spark: SparkSession,
      path: String,
      partKeyCol: String,
      pattern: String = "yyyyMMdd",
      targetBytes: Long = 128L * 1024 * 1024,
      partName: String = "par_key",
      subPart: Option[Migrate.SubPart] = None,
      srcFormat: String = "parquet",
      srcOptions: Map[String, String] = Map.empty): Stats = {
    val tmp = path + ".graft-compact-tmp"
    val bak = path + ".graft-compact-bak"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(bak)),
      s"$bak exists — a previous in-place compaction crashed mid-swap; " +
        s"restore it (rename back to $path) or delete it first")
    fs.delete(new Path(tmp), true) // stale tmp from a pre-swap crash: discard
    val st = rewritePartitioned(spark, path, tmp, partKeyCol, pattern,
      targetBytes, partName, subPart, srcFormat, srcOptions,
      skipCompacted = false)
    if (!fs.rename(new Path(path), new Path(bak)))
      throw new java.io.IOException(s"rename $path -> $bak failed")
    if (!fs.rename(new Path(tmp), new Path(path))) {
      fs.rename(new Path(bak), new Path(path)) // roll back
      throw new java.io.IOException(s"rename $tmp -> $path failed; original restored")
    }
    fs.delete(new Path(bak), true)
    st
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
