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
    if (spark.catalog.tableExists(s"$db.$table")) {
      val current = spark.table(s"$db.$table").schema.fields
        .map(f => (f.name, f.dataType)).toSet
      if (current != fields.map(f => (f.name, f.dataType)).toSet)
        spark.sql(s"DROP TABLE $db.$table") // external: metadata only
    }
    val colsDdl = fields.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partDdl =
      if (partNames.isEmpty) ""
      else partNames.mkString("PARTITIONED BY (", ", ", ")")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $db.$table ($colsDdl) USING $format " +
      s"$partDdl LOCATION '$path'")
    if (partNames.nonEmpty) spark.catalog.recoverPartitions(s"$db.$table")
  }

  /** `SHOW PARTITIONS` as data — the reference's per-partition directory
    * listing (CommonUtils.java:151-163) at catalog level.
    */
  def partitions(spark: SparkSession, dbTable: String): Seq[String] =
    spark.sql(s"SHOW PARTITIONS $dbTable").collect().map(_.getString(0)).toSeq.sorted

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
