package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-granular MERGE (upsert + delete) into a partitioned parquet
  * table — the warehouse mutation the reference could only express by
  * re-copying whole partitions (skip-if-exists, then overwrite), as one
  * Spark job that reads and rewrites ONLY the partitions the delta
  * touches, never the full table.
  *
  * Per-key semantics (classic MERGE):
  *   - WHEN MATCHED AND tombstone  THEN DELETE
  *   - WHEN MATCHED                THEN UPDATE (the delta row wins whole)
  *   - WHEN NOT MATCHED, no tombstone THEN INSERT
  *
  * Mechanics: the delta's distinct partition values (bounded — the
  * reference's own driver granularity, `CommonUtils.java:151-163`) prune
  * a static read of the destination; survivors (existing rows whose key
  * is absent from the delta) union the delta's non-tombstone rows; the
  * result stages to `<dest>.graft-upsert-tmp` and each touched partition
  * directory swaps in via rename (live → `.graft-upsert-bak` → delete),
  * the [[Compact.rewriteInPlacePartitioned]] discipline. A partition
  * whose last row was tombstoned is REMOVED (dynamic overwrite alone
  * cannot do that — it never touches a partition with no output rows).
  * Untouched partitions are never read, written, or renamed.
  *
  * CONTRACTS (documented, enforced where cheap):
  *   - a key's partition value is immutable: the delta carries the same
  *     partition value the key already has (true whenever the partition
  *     derives from an immutable attribute, e.g. the order date). A key
  *     whose partition "moved" would strand its old copy, because
  *     untouched partitions are by design never opened;
  *   - key columns are non-null (standard MERGE precondition);
  *   - partition values must render path-stably via toString (the
  *     warehouse convention everywhere in this repo: string date keys).
  *
  * Crash safety: a crash before any rename leaves the destination
  * untouched (stage dir is discardable); a crash mid-swap leaves that
  * partition's original under `.graft-upsert-bak` — recovery is a
  * rename back, never data loss, and a later run refuses to start while
  * a bak exists.
  */
object Upsert {

  final case class Stats(partsTouched: Long, partsRemoved: Long, rowsWritten: Long)

  def mergeByKey(
      spark: SparkSession,
      destPath: String,
      delta: DataFrame,
      keyCols: Seq[String],
      partNames: Seq[String],
      tombstoneCol: Option[String] = None): Stats = {
    require(keyCols.nonEmpty, "mergeByKey needs at least one key column")
    require(partNames.nonEmpty, "mergeByKey is partition-granular: pass partNames")
    val fs = new Path(destPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a snapshot table's manifests reference the CURRENT files by path;
    // swapping partition directories in place would leave every existing
    // manifest pointing at swapped-away bytes — time travel silently
    // broken. The snapshot-preserving MERGE is Snapshots.mergeByKey.
    require(!fs.exists(new Path(destPath, "_snapshots")),
      s"$destPath is a versioned snapshot table (contains _snapshots) — " +
        "in-place partition swap would corrupt time travel; use " +
        "Snapshots.mergeByKey, which publishes the merge as a new version")

    // MERGE precondition: at most one delta row per key. An update row and
    // a tombstone row for the same key would otherwise resolve silently to
    // "update wins" (survivors drop the key; unionByName keeps every
    // non-tombstone delta row, duplicating keys with 2+ update rows) —
    // the classic ambiguous-source MERGE error, so fail loudly instead.
    val dupKey = delta.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dupKey.isEmpty,
      s"delta carries multiple rows for key (${keyCols.mkString(",")}) = " +
        s"(${dupKey.headOption.fold("")(r => keyCols.indices.map(i => String.valueOf(r.get(i))).mkString(","))}) — " +
        "MERGE source keys must be unique (dedupe or pre-resolve the delta)")

    val upserts = tombstoneCol.fold(delta)(tc =>
      delta.filter(!coalesce(col(tc), lit(false))).drop(tc))
    val dataCols = upserts.columns.toSeq

    // bootstrap: merging into a not-yet-existing table is a plain load
    if (!fs.exists(new Path(destPath))) {
      val obs = new org.apache.spark.sql.Observation()
      upserts.observe(obs, count(lit(1)).as("rows"))
        .repartition(partNames.map(col): _*)
        .write.partitionBy(partNames: _*).mode("overwrite").parquet(destPath)
      return Stats(0L, 0L, obs.get("rows").asInstanceOf[Long])
    }

    // touched partition values — bounded: one row per partition
    val touched: Array[Row] = delta.select(partNames.map(col): _*).distinct().collect()
    if (touched.isEmpty) return Stats(0L, 0L, 0L)
    val pruneCond = touched.map(r => partNames.zipWithIndex.map { case (p, i) =>
      col(p) <=> lit(r.get(i)) }.reduce(_ && _)).reduce(_ || _)
    // align partition-column types to the delta's (the partitioned read
    // infers e.g. INT for yyyyMM string keys; the union must agree)
    val aligned = partNames.foldLeft(spark.read.parquet(destPath))((df, p) =>
      df.withColumn(p, col(p).cast(delta.schema(p).dataType)))
    val existing = aligned.filter(pruneCond).select(dataCols.map(col): _*)
    val survivors = existing.join(
      delta.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    val merged = survivors.unionByName(upserts.select(dataCols.map(col): _*))

    // stage, then swap each touched partition directory
    val tmp = destPath + ".graft-upsert-tmp"
    fs.delete(new Path(tmp), true)
    val obs = new org.apache.spark.sql.Observation()
    merged.observe(obs, count(lit(1)).as("rows"))
      .repartition(partNames.map(col): _*)
      .write.partitionBy(partNames: _*).mode("overwrite").parquet(tmp)
    val rows = obs.get("rows").asInstanceOf[Long]

    def leaf(root: String, r: Row): Path = new Path(root + "/" +
      partNames.zipWithIndex.map { case (p, i) =>
        p + "=" + Option(r.get(i)).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__")
      }.mkString("/"))
    touched.foreach { r =>
      val bak = new Path(leaf(destPath, r).toString + ".graft-upsert-bak")
      require(!fs.exists(bak),
        s"$bak exists — a previous merge crashed mid-swap; restore or delete it first")
    }
    var removed = 0L
    touched.foreach { r =>
      val live = leaf(destPath, r)
      val staged = leaf(tmp, r)
      val bak = new Path(live.toString + ".graft-upsert-bak")
      val hadOld = fs.exists(live)
      if (hadOld && !fs.rename(live, bak))
        throw new java.io.IOException(s"rename $live -> $bak failed")
      if (fs.exists(staged)) {
        fs.mkdirs(live.getParent)
        if (!fs.rename(staged, live)) {
          if (hadOld) fs.rename(bak, live) // roll this partition back
          throw new java.io.IOException(s"rename $staged -> $live failed; original restored")
        }
      } else if (hadOld) removed += 1 // every row tombstoned: partition gone
      // a stale bak permanently blocks every future merge touching this
      // partition (the pre-flight require refuses to start), so a failed
      // delete must surface HERE, on the merge that caused it
      if (fs.exists(bak) && !fs.delete(bak, true))
        throw new java.io.IOException(
          s"swap for $live succeeded but deleting $bak failed — remove it " +
            "manually or every future merge touching this partition will refuse to start")
    }
    val tmpPath = new Path(tmp)
    if (fs.exists(tmpPath) && !fs.delete(tmpPath, true))
      throw new java.io.IOException(s"merge succeeded but deleting stage dir $tmp failed")
    Stats(touched.length.toLong, removed, rows)
  }
}
