package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Versioned table snapshots — publish / time-travel read / diff /
  * rollback / vacuum over a plain parquet directory tree. The
  * reproducibility layer a training pipeline needs: "train on corpus
  * version 17" must mean the same bytes next month, even though the
  * corpus has moved on.
  *
  * The reference gets versioning implicitly by COPYING whole partition
  * trees per run (`TransWholeTablePartition.java:40-78` — every
  * migration is a new full tree); this is that idea with O(changed
  * files) storage instead of O(table) per version, expressed as the
  * standard log-of-manifests design (Iceberg/Delta's core, rebuilt here
  * from scratch on plain Hadoop FS + parquet):
  *
  *   - each publish writes data files into a fresh `data/<uuid>/` dir —
  *     existing files are IMMUTABLE, never rewritten or renamed;
  *   - a manifest `_snapshots/v<N>` lists every data file (relative
  *     path) visible in that version, one per line; append-mode
  *     manifests start from the previous version's list, so unchanged
  *     files are SHARED across versions, not copied;
  *   - the manifest is written to a temp name and RENAMED into place —
  *     the atomic-commit primitive of every Hadoop-compatible FS — so a
  *     version exists entirely or not at all; a crash mid-publish leaves
  *     only an invisible data dir + temp manifest for vacuum to sweep;
  *   - readers resolve a manifest (bounded metadata: file paths only)
  *     and hand the file list to the parquet scan — no flag files, no
  *     directory-mtime races with concurrent publishes;
  *   - rollback is roll-FORWARD: version N+1 re-publishes version V's
  *     file list, preserving history (an operator who rolls back still
  *     wants to audit what was rolled back FROM);
  *   - vacuum deletes data files referenced by NO manifest (crashed
  *     publishes, vacuumed-away history after `expire`); the listing is
  *     a distributed scan and the deletes run on executors, so a
  *     million-orphan sweep never serializes through the driver.
  *
  * At 100 TB: manifests hold paths, not data — a 100k-file version is a
  * few MB of text; publishes of disjoint tables never conflict; within
  * one table, last-rename-wins (single-writer per table is the
  * documented contract, same as Delta's on non-atomic-rename stores).
  */
object Snapshots {

  private val SNAP_DIR = "_snapshots"
  private val TMP_SUFFIX = ".tmp"

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Int): Path =
    new Path(s"$root/$SNAP_DIR/v$v")

  /** Published versions, ascending (temp/partial manifests invisible). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = new Path(s"$root/$SNAP_DIR")
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      .map(_.drop(1).toInt)
      .sorted
  }

  /** The file list (relative paths) a version resolves to. */
  def files(spark: SparkSession, root: String, version: Int): Seq[String] = {
    val f = fs(spark, root)
    val p = manifestPath(root, version)
    require(f.exists(p), s"snapshot v$version does not exist under $root")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Publish `df` as the next version. `append = true` keeps the previous
    * version's files visible alongside the new ones (incremental load);
    * `append = false` makes the new files the whole table (full refresh —
    * prior versions stay readable until `expire` + `vacuum`).
    * Returns the new version number.
    */
  def publish(spark: SparkSession, root: String, df: DataFrame,
      append: Boolean = false): Int = {
    val f = fs(spark, root)
    val dataDir = s"data/${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.parquet(s"$root/$dataDir")
    val newFiles = f.listStatus(new Path(s"$root/$dataDir")).toSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted
      .map(n => s"$dataDir/$n")
    val prev = versions(spark, root)
    val base: Seq[String] =
      if (append && prev.nonEmpty) files(spark, root, prev.last) else Seq.empty
    commit(f, root, prev.lastOption.getOrElse(0) + 1, base ++ newFiles)
  }

  /** Roll back by rolling FORWARD: the next version re-lists exactly the
    * files of `toVersion`. No data moves; history is preserved.
    */
  def rollback(spark: SparkSession, root: String, toVersion: Int): Int = {
    val f = fs(spark, root)
    val next = versions(spark, root).lastOption.getOrElse(0) + 1
    commit(f, root, next, files(spark, root, toVersion))
  }

  private def commit(f: FileSystem, root: String, v: Int, list: Seq[String]): Int = {
    val target = manifestPath(root, v)
    val tmp = new Path(target.toString + TMP_SUFFIX)
    f.mkdirs(target.getParent)
    val out = f.create(tmp, true)
    try out.write((list.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, target))
      throw new java.io.IOException(
        s"commit of snapshot v$v failed: rename $tmp -> $target " +
          "(concurrent publisher? snapshots are single-writer per table)")
    v
  }

  /** Read a version (default: latest). The manifest's file list goes
    * straight to the parquet source, so the scan is exactly the version's
    * files — immune to concurrent publishes and leftover crash debris.
    */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no snapshots published under $root")
    val v = version.getOrElse(vs.last)
    val paths = files(spark, root, v).map(rel => s"$root/$rel")
    spark.read.parquet(paths: _*)
  }

  /** Rows contained in files ADDED between `from` and `to` — the
    * incremental-consumption path ("process only what version N added",
    * e.g. train on documents new since the last run). Correct because
    * data files are immutable: a file present in `to` but not `from`
    * holds exactly rows that `from` could not see. Returns an empty
    * frame with the `to` schema when nothing was added (a rollback or
    * pure-removal version). At 100 TB the scan covers only the delta
    * files — incremental cost is O(new data), never O(table).
    */
  def readAdded(spark: SparkSession, root: String, from: Int, to: Int): DataFrame = {
    val added = (files(spark, root, to).toSet -- files(spark, root, from).toSet).toSeq.sorted
    if (added.isEmpty) read(spark, root, Some(to)).limit(0)
    else spark.read.parquet(added.map(rel => s"$root/$rel"): _*)
  }

  /** Files added and removed between two versions, as a DataFrame
    * (`file`, `change` ∈ added|removed) — the audit surface for "what
    * did version 18 actually change?".
    */
  def diff(spark: SparkSession, root: String, from: Int, to: Int): DataFrame = {
    import spark.implicits._
    val a = files(spark, root, from).toSet
    val b = files(spark, root, to).toSet
    ((b -- a).toSeq.sorted.map(f => (f, "added")) ++
      (a -- b).toSeq.sorted.map(f => (f, "removed")))
      .toDF("file", "change")
  }

  /** Drop manifests older than `keepLast` versions (their exclusively-
    * owned data files become vacuum-eligible). Returns dropped versions.
    */
  def expire(spark: SparkSession, root: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val f = fs(spark, root)
    val drop = versions(spark, root).dropRight(keepLast)
    drop.foreach(v => f.delete(manifestPath(root, v), false))
    drop
  }

  /** Delete every file under `data/` referenced by NO live manifest —
    * crashed publishes and expired history. The on-disk listing is a
    * distributed scan ([[FileManifest.listTree]]) and the deletes run on
    * EXECUTORS via foreachPartition, so the sweep scales with cluster
    * width, not driver memory. Returns the number of files deleted.
    */
  def vacuum(spark: SparkSession, root: String): Long = {
    import spark.implicits._
    val f = fs(spark, root)
    if (!f.exists(new Path(s"$root/data"))) return 0L
    val referenced = versions(spark, root)
      .flatMap(v => files(spark, root, v)).toSet
    val refDf = referenced.toSeq.toDF("name")
    val onDisk = FileManifest.listTree(spark, s"$root/data")
      .select(concat(lit("data/"), col("name")).as("name"))
    val orphans = onDisk.join(refDf, Seq("name"), "left_anti")
    val qualifiedRoot = f.makeQualified(new Path(root)).toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val deleted = spark.sparkContext.longAccumulator("snapshots.vacuumed")
    orphans.select("name").as[String].foreachPartition { it: Iterator[String] =>
      val pfs = new Path(qualifiedRoot).getFileSystem(conf.value)
      it.foreach { rel =>
        if (pfs.delete(new Path(s"$qualifiedRoot/$rel"), false)) deleted.add(1L)
      }
    }
    deleted.value
  }
}
