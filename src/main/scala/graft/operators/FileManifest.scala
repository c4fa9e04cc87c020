package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level manifests as DataFrames — the recursive `listFile`
  * (CommonUtils.java:134-140) and its name+length compare
  * (CommonUtils.java:99-124), kept for the cases where file-granular
  * verification is genuinely wanted (e.g. binary assets). Uses Spark's
  * `binaryFile` source restricted to metadata columns, so listing runs as
  * a distributed scan, not a driver loop.
  */
object FileManifest {

  /** (name, length) per data file under `path` (recursive). */
  def list(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"))
      .filter(!col("name").startsWith("_") && !col("name").startsWith("."))

  /** (relative path, length, mtime) per data file under `path` — for
    * tree-shaped manifests where duplicate basenames across partition
    * dirs (every `part-00000`) must not collide. The relative path lands
    * in the same `name` column, so [[diff]] applies unchanged; `mtime`
    * feeds age-gated sweeps ([[graft.operators.Snapshots.vacuum]]'s
    * grace period).
    */
  def listTree(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val root = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(
        // strip "<qualified root>/" — substring is 1-based
        substring(col("path"), root.length + 2, Int.MaxValue).as("name"),
        col("length"),
        col("modificationTime").as("mtime"))
      .filter {
        val base = regexp_extract(col("name"), "([^/]+)$", 1)
        !base.startsWith("_") && !base.startsWith(".")
      }
  }

  /** Full-outer name→length compare of two trees; the row-level statuses
    * mirror the reference's count/missing/length alerts.
    */
  def diff(src: DataFrame, dst: DataFrame): DataFrame =
    src.select(col("name"), col("length").as("src_len"))
      .join(dst.select(col("name"), col("length").as("dst_len")), Seq("name"), "full_outer")
      .withColumn("status",
        when(col("dst_len").isNull, lit("missing_in_dest"))
          .when(col("src_len").isNull, lit("missing_in_src"))
          .when(col("src_len") =!= col("dst_len"), lit("length_mismatch"))
          .otherwise(lit("ok")))

  /** Orphan data files in a STREAMING sink directory: files present on
    * disk but absent from the sink's `_spark_metadata` commit log. A
    * micro-batch that crashed between writing its part files and
    * committing leaves such files behind; readers that honor the log
    * (any Spark read of the sink root) never see them, but they hold
    * bytes forever and a log-oblivious consumer (plain `ls`, a non-Spark
    * reader pointed at a subdirectory) silently double-counts — so the
    * maintenance sweep is: list orphans, delete after a grace period.
    * Returns (name, length) relative to `sinkPath`. The commit log is
    * JSON-lines-per-batch (v1 `SinkFileStatus`); reading it is
    * driver-light metadata, the disk listing is the distributed
    * [[listTree]].
    */
  def streamingSinkOrphans(spark: SparkSession, sinkPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(sinkPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(p).toString
    val logDir = new org.apache.hadoop.fs.Path(p, "_spark_metadata")
    require(fs.exists(logDir), s"$sinkPath has no _spark_metadata — not a streaming sink")
    // Each log file is a "v1" version header followed by one JSON object
    // per committed file; compaction files (N.compact) repeat earlier
    // batches — distinct() absorbs that. The log CANNOT be read with
    // spark.read.text: Spark's file index filters out files living under a
    // '_'-prefixed directory even when that directory is the explicit load
    // path, so the scan returns zero rows and every committed file would
    // be misreported as an orphan. Read it driver-side via the Hadoop FS —
    // the commit log is bounded driver-sized metadata by construction (one
    // JSON line per committed file, periodically compacted) — then hand
    // the parsed lines to Spark as a local relation for the anti-join.
    // The log may qualify paths differently than makeQualified
    // (file:/x vs file:///x) — normalize both sides to the bare URI path
    // before stripping the root prefix.
    val rootUriPath = fs.makeQualified(p).toUri.getPath
    def relName(path: Column): Column = substring(
      regexp_replace(path, "^[a-zA-Z0-9+.-]+:/+", "/"),
      rootUriPath.length + 2, Int.MaxValue)
    val logLines = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(logDir)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .foreach { st =>
        val rdr = new java.io.BufferedReader(new java.io.InputStreamReader(
          fs.open(st.getPath), java.nio.charset.StandardCharsets.UTF_8))
        try {
          var line = rdr.readLine()
          while (line != null) {
            if (line.startsWith("{")) logLines += line
            line = rdr.readLine()
          }
        } finally rdr.close()
      }
    import spark.implicits._
    val committed = logLines.toSeq.toDF("value")
      .select(get_json_object(col("value"), "$.path").as("path"))
      .filter(col("path").isNotNull)
      .select(relName(col("path")).as("name"))
      .distinct()
    // The disk side must list what is ACTUALLY on disk — but any Spark read
    // of a directory containing _spark_metadata (binaryFile included) swaps
    // in the log-honoring MetadataLogFileIndex and would hide exactly the
    // orphans we're sweeping for. The ignoreMetadata flag must be in force
    // when .load() builds the file index, so set/restore it around that.
    val ignoreKey = "spark.sql.streaming.fileStreamSink.ignoreMetadata"
    val prevIgnore = spark.conf.getOption(ignoreKey)
    spark.conf.set(ignoreKey, "true")
    val onDisk =
      try spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(sinkPath)
        .select(relName(col("path")).as("name"), col("length"))
        .filter {
          val base = regexp_extract(col("name"), "([^/]+)$", 1)
          !base.startsWith("_") && !base.startsWith(".")
        }
      finally prevIgnore match {
        case Some(v) => spark.conf.set(ignoreKey, v)
        case None    => spark.conf.unset(ignoreKey)
      }
    onDisk.join(committed, Seq("name"), "left_anti")
  }
}
