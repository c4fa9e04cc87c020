package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-granular table migration — `TransTablePartition` /
  * `TransWholeTablePartition` rebuilt on Spark.
  *
  * The reference copied each partition sequentially through the driver and
  * a local-disk staging hop (TransTablePartition.java:115-140). Here the
  * whole range is one distributed job: executors read source splits and
  * write destination partitions directly; there is no staging hop and no
  * driver-side data path. Cross-cluster migration is the same code with
  * fully-qualified `hdfs://src/...` / `hdfs://dst/...` URIs.
  *
  * Idempotence (the reference's skip-if-exists + email,
  * TransTablePartition.java:126-131) comes from
  * `partitionOverwriteMode=dynamic`: re-running overwrites exactly the
  * partitions in range with identical content, touching nothing else.
  * `skipExisting=true` reproduces the reference's skip semantics exactly:
  * existing destination partitions are left untouched and reported.
  */
object Migrate {

  final case class Result(partitionsWritten: Long, partitionsSkipped: Long,
      rowsWritten: Long, violations: Map[String, Long] = Map.empty)

  /** Secondary partition level — the reference's `-sp true` two-level
    * `part1/part2/` layout (HDFSMerge.java:64,90-112; README.md:37). The
    * value is `date_format(srcCol, pattern)` when a pattern is given (an
    * hour-under-day layout), or the raw column as string (a categorical
    * sub-key like a source/category column) when it is None.
    */
  final case class SubPart(srcCol: String, pattern: Option[String] = Some("HH"),
      name: String = "par_sub") {
    private[graft] def value: org.apache.spark.sql.Column =
      pattern.map(p => date_format(col(srcCol), p)).getOrElse(col(srcCol).cast("string"))
  }

  /** Migrate the [start, end] (inclusive, `yyyy-MM-dd`) date range of
    * `srcPath` to `destPath`, laid out as `par_key=<dayKey>` Hive-style
    * partitions (the reference's `pn=value` dirs, CommonUtils.java:160).
    *
    * @param dateCol   timestamp/date column playing the reference's
    *                  partition-date role
    * @param pattern   partition-value pattern (reference `-pp`)
    * @param alerter   receives one message per skipped partition (the
    *                  SendEmail role)
    * @param targetBytes max bytes a destination leaf may hold in ONE file:
    *                  a hot partition value fans out over
    *                  ⌈bytes/target⌉ writer tasks/files instead of
    *                  funnelling through a single reducer (the same
    *                  oversized-leaf salt as [[Compact]])
    */
  def migrateRange(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      dateCol: String,
      start: String,
      end: String,
      pattern: String = "yyyyMMdd",
      skipExisting: Boolean = false,
      alerter: Alerter = Alerter.Log,
      partName: String = "par_key",
      subPart: Option[SubPart] = None,
      srcFormat: String = "parquet",
      srcOptions: Map[String, String] = Map.empty,
      targetBytes: Long = 128L * 1024 * 1024,
      checks: Seq[Quality.Check] = Nil): Result = {

    val src = read(spark, srcPath, srcFormat, srcOptions)
      // end is inclusive at day granularity: < end + 1 day
      .filter(col(dateCol) >= to_timestamp(lit(start)) &&
        col(dateCol) < to_timestamp(date_add(to_date(lit(end)), 1)))
      .withColumn(partName, date_format(col(dateCol), pattern))

    migrate(spark, withSub(src, subPart), destPath, skipExisting, alerter,
      partName +: subPart.map(_.name).toSeq,
      targetBytes, srcBytesPerRow(spark, srcPath, srcFormat, srcOptions, targetBytes),
      checks)
  }

  /** Migrate the whole table (TransWholeTablePartition): no date filter. */
  def migrateAll(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      dateCol: String,
      pattern: String = "yyyyMMdd",
      skipExisting: Boolean = false,
      alerter: Alerter = Alerter.Log,
      partName: String = "par_key",
      subPart: Option[SubPart] = None,
      srcFormat: String = "parquet",
      srcOptions: Map[String, String] = Map.empty,
      targetBytes: Long = 128L * 1024 * 1024,
      checks: Seq[Quality.Check] = Nil): Result = {
    val src = read(spark, srcPath, srcFormat, srcOptions)
      .withColumn(partName, date_format(col(dateCol), pattern))
    migrate(spark, withSub(src, subPart), destPath, skipExisting, alerter,
      partName +: subPart.map(_.name).toSeq,
      targetBytes, srcBytesPerRow(spark, srcPath, srcFormat, srcOptions, targetBytes),
      checks)
  }

  /** CONTINUOUS incremental migration — the reference's cron-driven
    * re-run loop (run trans-partition for yesterday, every day;
    * TransTablePartition.java's whole purpose) collapsed into one
    * Structured Streaming job. The file source's checkpointed listing
    * replaces the skipExisting probe: a source file is read exactly once
    * across restarts, new files are picked up on the next trigger, and
    * the parquet sink's transactional commit log (`_spark_metadata`)
    * makes the write side exactly-once — a crashed batch re-runs without
    * duplicating rows, which the batch path can only approximate at
    * partition granularity (dynamic overwrite).
    *
    * `Trigger.AvailableNow` drains everything currently present and
    * stops — the scheduled-batch shape (run it from cron exactly like
    * the reference, keeping incremental state in `checkpoint`). Pass
    * `drainAndStop = false` for a resident query that follows the source
    * indefinitely. `sourceOptions` reaches the file source (e.g.
    * `maxFilesPerTrigger` to rate-limit a huge backfill into bounded
    * micro-batches).
    *
    * `maxFileAge` defaults here to effectively-infinite (overridable via
    * `sourceOptions`): the file source's own default of 7 days silently
    * drops a newly ARRIVED file whose modification time is older than 7
    * days behind the newest seen — e.g. a backfill copied with preserved
    * mtimes (`distcp -p`) — violating the exactly-once pickup guarantee
    * documented above. The cost is checkpoint file-log size, which the
    * source compacts; correctness beats a smaller log.
    */
  def streamIncremental(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      dateCol: String,
      checkpoint: String,
      pattern: String = "yyyyMMdd",
      partName: String = "par_key",
      subPart: Option[SubPart] = None,
      sourceOptions: Map[String, String] = Map.empty,
      drainAndStop: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    // streaming file sources need an explicit schema: one driver-side
    // footer read of the existing data, no scan
    val schema = spark.read.parquet(srcPath).schema
    val opts = Map("maxFileAge" -> "36500d") ++ sourceOptions
    val src = spark.readStream.options(opts).schema(schema).parquet(srcPath)
      .withColumn(partName, date_format(col(dateCol), pattern))
    val trigger =
      if (drainAndStop) org.apache.spark.sql.streaming.Trigger.AvailableNow()
      else org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 minute")
    withSub(src, subPart).writeStream
      .format("parquet")
      .option("path", destPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partName +: subPart.map(_.name).toSeq: _*)
      .trigger(trigger)
      .start()
  }

  /** Bytes-per-row estimate of the source, or None when the whole source
    * fits `targetBytes` (then no destination leaf can be oversized and the
    * row-count job is skipped — the common case). The directory walk is
    * cheap; the count is metadata-only for parquet and one scan for
    * csv/json — paid only when the source is big enough to need splitting,
    * and the migration reads it all anyway.
    */
  private def srcBytesPerRow(spark: SparkSession, srcPath: String,
      srcFormat: String, srcOptions: Map[String, String],
      targetBytes: Long): () => Option[Double] = () => {
    val (_, srcBytes) = Compact.pathStats(spark, srcPath)
    if (srcBytes <= targetBytes) None
    else {
      val rows = read(spark, srcPath, srcFormat, srcOptions).count()
      Some(srcBytes.toDouble / math.max(1L, rows))
    }
  }

  /** Structured source in any Spark-readable format (parquet/csv/json/orc
    * — the reference moved Hive tables of arbitrary serde as opaque bytes;
    * here non-parquet sources are READ structurally and land as parquet
    * partitions). For literal byte-preserving moves use [[FileMigrate]].
    * Shared by the CLI's post-copy verify so both paths parse the source
    * identically.
    */
  private[graft] def read(spark: SparkSession, path: String, format: String,
      options: Map[String, String]): DataFrame =
    spark.read.format(format).options(options).load(path)

  private def withSub(df: DataFrame, subPart: Option[SubPart]): DataFrame =
    subPart.fold(df)(sp => df.withColumn(sp.name, sp.value))

  private def migrate(
      spark: SparkSession,
      srcWithKey: DataFrame,
      destPath: String,
      skipExisting: Boolean,
      alerter: Alerter,
      partNames: Seq[String],
      targetBytes: Long = Long.MaxValue,
      bytesPerRow: () => Option[Double] = () => None,
      checks: Seq[Quality.Check] = Nil): Result = {

    val partCols = partNames.map(col)
    val toWrite =
      if (!skipExisting) srcWithKey
      else existingPartitions(spark, destPath, partNames) match {
        case None => srcWithKey
        case Some(existing) =>
          // partition-level anti-join against the existing destination
          // (the reference's per-partition fs.exists check; here one
          // distributed job over partition *values*, never rows).
          // Renamed keys + NULL-SAFE equality: existingPartitions maps
          // __HIVE_DEFAULT_PARTITION__ dirs back to null, and a plain
          // equi-join would never match them — re-migrating every
          // NULL-key partition on each skipExisting run.
          // broadcast: the frame is bounded by the partition count and
          // driver-built (no stats) — without the hint a stats-less plan
          // can fall back to sort-merge against the full source
          val exNames = partNames.indices.map(i => s"__e$i")
          val ex = broadcast(existing.toDF(exNames: _*))
          val cond = partNames.zip(exNames)
            .map { case (p, e) => col(p) <=> col(e) }.reduce(_ && _)
          val skipped = srcWithKey.select(partCols: _*).distinct()
            .join(ex, cond, "left_semi")
            .collect() // bounded: one row per partition
            .map(r => partNames.indices.map(i =>
              s"${partNames(i)}=${Option(r.getString(i)).getOrElse("__HIVE_DEFAULT_PARTITION__")}")
              .mkString("/"))
            .sorted
          skipped.foreach(p => alerter.alert("migrate.skip",
            s"destination partition already exists: $p"))
          srcWithKey.join(ex, cond, "left_anti")
      }

    // Single distributed write; shuffle by partition key so each task owns
    // whole partitions (avoids the many-small-files write pattern) —
    // UNLESS a leaf exceeds targetBytes, in which case its rows are
    // salted over ⌈bytes/target⌉ buckets ([[Compact.leafSalted]]) so a
    // hot partition value fans out across writer tasks instead of
    // funnelling one multi-TB file through a single reducer.
    val repartitioned =
      bytesPerRow().flatMap(bpr =>
          Compact.leafSalted(spark, toWrite, partNames, targetBytes, _ => bpr)) match {
        case None => toWrite.repartition(partCols: _*)
        case Some((s, totalSplits)) =>
          // EXPLICIT partition count ≥ the split total: an unpinned
          // repartition lets AQE coalesce the salt buckets back into one
          // task per leaf, silently undoing the split
          val n = totalSplits
            .max(spark.sparkContext.defaultParallelism.toLong)
            .min(Int.MaxValue.toLong).toInt
          s.repartition(n, (partCols :+ col("__salt")): _*)
            .select(srcWithKey.columns.map(col).toIndexedSeq: _*)
      }
    // rowsWritten, the distinct-partition count, AND any quality-check
    // violation counts ride along via ONE observe node (partition keys are
    // bounded — the reference's own driver granularity — so a collect_set
    // metric is safe) — no second scan of the source.
    val obs = new org.apache.spark.sql.Observation()
    val keyed = repartitioned.observe(obs,
        count(lit(1)).as("rows"),
        (size(collect_set(struct(partCols: _*))).as("nparts") +:
          Quality.metrics(checks)): _*)
    keyed.write
      .partitionBy(partNames: _*)
      .mode("overwrite")
      // per-write dynamic overwrite: only partitions present in `keyed` are
      // replaced, REGARDLESS of the session's partitionOverwriteMode — on a
      // session left at the 'static' default, mode("overwrite") alone would
      // truncate the whole destination (including partitions skipExisting
      // just promised to keep).
      .option("partitionOverwriteMode", "dynamic")
      .parquet(destPath)
    // an empty write registers no observation metrics at all — treat the
    // missing keys as zeros rather than throwing
    val rowsWritten = obs.get.getOrElse("rows", 0L).asInstanceOf[Long]
    val nWritten = obs.get.get("nparts").fold(0L)(_.asInstanceOf[Int].toLong)
    val nAll =
      if (!skipExisting) nWritten
      else srcWithKey.select(partCols: _*).distinct().count()
    Result(
      partitionsWritten = nWritten,
      partitionsSkipped = nAll - nWritten,
      rowsWritten = rowsWritten,
      violations = Quality.report(Quality.violations(obs, checks), alerter))
  }

  /** Distinct partition-key tuples already present at destPath (None if the
    * destination does not exist yet).
    *
    * Values are read from the `name=value` DIRECTORY NAMES, not through a
    * Spark partition-discovery read: partition-column type inference
    * parses zero-padded values like `par_sub=00` (the default hour
    * sub-partition) as integer 0, whose string form "0" then never matches
    * the source side's `date_format` "00" — silently re-migrating every
    * early-morning partition on each skipExisting run. Directory names are
    * the layout's ground truth and come back verbatim. Driver-side but
    * bounded by partition count (the reference's own granularity,
    * TransTablePartition.java:126-131).
    */
  def existingPartitions(spark: SparkSession, destPath: String,
      partNames: Seq[String] = Seq("par_key")): Option[DataFrame] =
    leafDirs(spark, destPath, partNames).map { case (fs, leaves) =>
      // a leaf only counts as migrated if it holds at least one DATA file:
      // a crashed/partial previous run can leave an empty value directory,
      // and skipExisting must re-migrate it, not skip it forever
      val tuples = leaves.collect {
        case (vals, leafDir) if fs.listStatus(leafDir).exists { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        } => vals
      }
      val schema = org.apache.spark.sql.types.StructType(
        partNames.map(n => org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)))
      val rows = tuples.map(vs => org.apache.spark.sql.Row.fromSeq(vs))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    }

  /** Walk destPath's `name=value` directory tree down `partNames` levels:
    * (filesystem, Seq of (partition values, leaf dir)) — None when the
    * root does not exist. Values are read from the DIRECTORY NAMES (see
    * [[existingPartitions]] for why partition-discovery reads are wrong
    * here), percent-unescaped, with `__HIVE_DEFAULT_PARTITION__` mapped
    * back to null (callers join null-safely with <=>). Shared with
    * [[Compact]]'s already-compact skip.
    */
  private[operators] def leafDirs(spark: SparkSession, destPath: String,
      partNames: Seq[String])
      : Option[(org.apache.hadoop.fs.FileSystem, Seq[(Seq[String], org.apache.hadoop.fs.Path)])] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(destPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    def unescape(v: String): String = {
      val u = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v)
      if (u == "__HIVE_DEFAULT_PARTITION__") null else u
    }
    def valueDirs(dir: Path, name: String): Seq[(String, Path)] =
      fs.listStatus(dir).toSeq
        .filter(_.isDirectory)
        .flatMap { st =>
          val n = st.getPath.getName
          if (n.startsWith(name + "=")) Some(unescape(n.drop(name.length + 1)) -> st.getPath)
          else None
        }
    Some((fs, partNames.foldLeft(Seq(Seq.empty[String] -> root)) { (acc, name) =>
      acc.flatMap { case (vals, dir) => valueDirs(dir, name).map { case (v, d) => (vals :+ v, d) } }
    }))
  }
}
