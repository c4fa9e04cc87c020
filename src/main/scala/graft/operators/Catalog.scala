package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StringType, StructField}

/** Thin catalog layer: lets Migrate/Compact/the CLI address tables as
  * `db.table` instead of raw paths — the reference's warehouse convention
  * (`/user/hive/warehouse/<db>.db/<table>/<pn>=<v>`, KeyConstant.java:26,
  * TransTablePartition.java:116-118) expressed through `spark.catalog`
  * rather than string concatenation.
  *
  * Everything here is metadata-only: locations resolve through the
  * session catalog, destination tables register as EXTERNAL datasource
  * tables over the directories the operators already write, and partition
  * discovery is `recoverPartitions` (MSCK REPAIR) + `SHOW PARTITIONS` —
  * the catalog mirror of the reference's directory listing. The data path
  * stays the existing distributed Migrate/Compact write.
  */
object Catalog {

  /** Storage location of `db.table` (or `table` in the current database),
    * from the session catalog.
    */
  def location(spark: SparkSession, dbTable: String): String =
    spark.sql(s"DESCRIBE TABLE EXTENDED $dbTable").collect()
      .find(_.getString(0) == "Location")
      .map(_.getString(1))
      .getOrElse(throw new IllegalArgumentException(
        s"table $dbTable has no catalog location"))

  /** Location a table of `db` would live at: `<db location>/<table>`. */
  def tableLocation(spark: SparkSession, db: String, table: String): String = {
    val dbLoc = spark.sql(s"DESCRIBE DATABASE $db").collect()
      .find(r => r.getString(0) == "Location")
      .map(_.getString(1))
      .getOrElse(throw new IllegalArgumentException(s"database $db has no location"))
    s"$dbLoc/$table"
  }

  /** Register (idempotently) an EXTERNAL table over `path`, inferring the
    * schema from the files; `partNames` become catalog partition columns
    * and existing `name=value` directories are discovered immediately
    * (the MSCK REPAIR step). Re-registering after new partitions landed
    * just re-runs discovery; re-registering after the DATA's schema
    * evolved (a migrate that added a column) drops and recreates the
    * catalog entry — metadata only, the external files are untouched —
    * so the table never serves a stale column list.
    */
  def register(spark: SparkSession, db: String, table: String, path: String,
      partNames: Seq[String] = Nil, format: String = "parquet"): Unit = {
    val inferred = spark.read.format(format).load(path).schema
    // partition values are directory strings (type inference is off
    // engine-wide, SparkEnv); anything the inference missed defaults to
    // string for the same reason
    val fields = inferred.fields.filterNot(f => partNames.contains(f.name)) ++
      partNames.map(n => inferred.fields.find(_.name == n)
        .getOrElse(StructField(n, StringType)))
    var keepProps = Map.empty[String, String]
    if (spark.catalog.tableExists(s"$db.$table")) {
      val current = spark.table(s"$db.$table").schema.fields
        .map(f => (f.name, f.dataType)).toSet
      if (current != fields.map(f => (f.name, f.dataType)).toSet) {
        // USER properties ride the recreate (the drop is an internal
        // schema refresh, not a user intent to clear metadata)
        keepProps = tableProperties(spark, s"$db.$table").filterNot(p => isInternalProp(p._1))
        spark.sql(s"DROP TABLE $db.$table") // external: metadata only
      }
    }
    val colsDdl = fields.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partDdl =
      if (partNames.isEmpty) ""
      else partNames.mkString("PARTITIONED BY (", ", ", ")")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $db.$table ($colsDdl) USING $format " +
      s"$partDdl LOCATION '$path'")
    if (partNames.nonEmpty) spark.catalog.recoverPartitions(s"$db.$table")
    setTableProperties(spark, s"$db.$table", keepProps)
  }

  /** `SHOW PARTITIONS` as data — the reference's per-partition directory
    * listing (CommonUtils.java:151-163) at catalog level.
    */
  def partitions(spark: SparkSession, dbTable: String): Seq[String] =
    spark.sql(s"SHOW PARTITIONS $dbTable").collect().map(_.getString(0)).toSeq.sorted

  /** ALTER TABLE … DROP PARTITION. Metadata-only by default (the table is
    * EXTERNAL — the files stay and a later `recoverPartitions` would
    * re-adopt them); `purge = true` also deletes the partition directory,
    * the catalog form of the reference's delete-before-merge sweep
    * (HDFSMerge.java:174-189). Values are escaped like the write path
    * escapes directory names, so any partition `SHOW PARTITIONS` lists
    * can be dropped back.
    */
  def dropPartition(spark: SparkSession, dbTable: String,
      spec: Seq[(String, String)], purge: Boolean = false): Unit = {
    require(spec.nonEmpty, "empty partition spec")
    val specDdl = spec.map { case (k, v) => s"`$k`='${v.replace("'", "\\'")}'" }
      .mkString("PARTITION (", ", ", ")")
    val dir =
      if (!purge) None
      else {
        // resolve the leaf location BEFORE the metadata drop
        val base = location(spark, dbTable)
        val rel = spec.map { case (k, v) =>
          s"$k=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(v)
        }.mkString("/")
        Some(new org.apache.hadoop.fs.Path(s"$base/$rel"))
      }
    spark.sql(s"ALTER TABLE $dbTable DROP IF EXISTS $specDdl")
    dir.foreach { d =>
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(d, true)
    }
  }

  /** Retention sweep: drop every partition whose FIRST partition value is
    * lexicographically below `cutoff` — exact date semantics for the
    * fixed-width patterns the engine writes (yyyyMMdd / yyyyMM / yyyy).
    * Returns the dropped partition values. The listing is catalog
    * metadata, bounded by the partition count.
    */
  def dropPartitionsOlderThan(spark: SparkSession, dbTable: String,
      cutoff: String, partName: String = "par_key",
      purge: Boolean = false): Seq[String] = {
    val victims = partitions(spark, dbTable)
      .map(_.split('/').head)
      .filter(_.startsWith(partName + "="))
      .map(s => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(s.substring(partName.length + 1)))
      .distinct
      .filter(_ < cutoff)
    victims.foreach(v => dropPartition(spark, dbTable, Seq(partName -> v), purge))
    victims
  }

  /** User table properties (SHOW TBLPROPERTIES as a map). */
  def tableProperties(spark: SparkSession, dbTable: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES $dbTable").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  /** ALTER TABLE … SET TBLPROPERTIES. */
  def setTableProperties(spark: SparkSession, dbTable: String,
      props: Map[String, String]): Unit =
    if (props.nonEmpty) {
      val ddl = props.toSeq.sortBy(_._1)
        .map { case (k, v) => s"'${k.replace("'", "\\'")}'='${v.replace("'", "\\'")}'" }
        .mkString(", ")
      spark.sql(s"ALTER TABLE $dbTable SET TBLPROPERTIES ($ddl)")
    }

  /** Engine-managed keys that must not be copied through a drop/recreate. */
  private def isInternalProp(k: String): Boolean =
    k.startsWith("transient_") || k.startsWith("spark.sql.") ||
      k == "external" || k == "numFiles" || k == "totalSize"

  /** [[Migrate.migrateRange]] addressed by catalog names: resolves the
    * source location, writes under the destination DATABASE's directory,
    * and registers + discovers the destination table. `destTable` is
    * `db.table`; the database must exist.
    */
  def migrateRangeTable(spark: SparkSession, srcTable: String, destTable: String,
      dateCol: String, start: String, end: String,
      pattern: String = "yyyyMMdd",
      skipExisting: Boolean = false,
      alerter: Alerter = Alerter.Log,
      partName: String = "par_key",
      subPart: Option[Migrate.SubPart] = None,
      targetBytes: Long = 128L * 1024 * 1024): Migrate.Result = {
    val Array(ddb, dtbl) = splitDbTable(destTable)
    val destPath = tableLocation(spark, ddb, dtbl)
    val r = Migrate.migrateRange(spark, location(spark, srcTable), destPath,
      dateCol, start, end, pattern, skipExisting, alerter, partName, subPart,
      targetBytes = targetBytes)
    register(spark, ddb, dtbl, destPath, partName +: subPart.map(_.name).toSeq)
    r
  }

  /** [[Migrate.migrateAll]] addressed by catalog names. */
  def migrateAllTable(spark: SparkSession, srcTable: String, destTable: String,
      dateCol: String,
      pattern: String = "yyyyMMdd",
      skipExisting: Boolean = false,
      alerter: Alerter = Alerter.Log,
      partName: String = "par_key",
      subPart: Option[Migrate.SubPart] = None,
      targetBytes: Long = 128L * 1024 * 1024): Migrate.Result = {
    val Array(ddb, dtbl) = splitDbTable(destTable)
    val destPath = tableLocation(spark, ddb, dtbl)
    val r = Migrate.migrateAll(spark, location(spark, srcTable), destPath,
      dateCol, pattern, skipExisting, alerter, partName, subPart,
      targetBytes = targetBytes)
    register(spark, ddb, dtbl, destPath, partName +: subPart.map(_.name).toSeq)
    r
  }

  /** [[Compact.rewritePartitioned]] addressed by catalog names. */
  def compactTable(spark: SparkSession, srcTable: String, destTable: String,
      partKeyCol: String,
      pattern: String = "yyyyMMdd",
      targetBytes: Long = 128L * 1024 * 1024,
      partName: String = "par_key",
      subPart: Option[Migrate.SubPart] = None): Compact.Stats = {
    val Array(ddb, dtbl) = splitDbTable(destTable)
    val destPath = tableLocation(spark, ddb, dtbl)
    val st = Compact.rewritePartitioned(spark, location(spark, srcTable), destPath,
      partKeyCol, pattern, targetBytes, partName, subPart)
    register(spark, ddb, dtbl, destPath, partName +: subPart.map(_.name).toSeq)
    st
  }

  private def splitDbTable(dbTable: String): Array[String] = {
    val parts = dbTable.split('.')
    require(parts.length == 2, s"expected db.table, got $dbTable")
    parts
  }
}
