package graft.sources

import graft.operators.Snapshots

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import org.apache.hadoop.fs.Path

/** A Spark `TableCatalog` over a warehouse directory of snapshot tables,
  * so plain SQL reaches the snapshot layer with zero API calls:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.snap.warehouse", "/data/tables")
  *   spark.sql("SELECT * FROM snap.events")                            // latest
  *   spark.sql("SELECT * FROM snap.events FOR VERSION AS OF 3")        // travel
  *   spark.sql("SELECT * FROM snap.events FOR TIMESTAMP AS OF '...'")  // travel
  * }}}
  *
  * Every table is the snapshot root `<warehouse>/<name>` (namespaces map
  * to subdirectories); loads return the same [[SnapshotTable]] the DSv2
  * source serves, so catalog reads inherit the whole pushdown stack —
  * stats/bloom file skipping, metadata-only aggregates, limit pushdown,
  * runtime (DPP) pruning — and `FOR VERSION/TIMESTAMP AS OF` pins the
  * version through the same manifest resolution as `option("version")` /
  * `option("timestampAsOf")`.
  *
  * Management verbs: `CREATE TABLE` publishes an empty v1 with the
  * declared schema (the snapshot layer's schema header), `DROP TABLE`
  * removes the root, `RENAME` is a filesystem move (atomic same-FS),
  * `ALTER TABLE ADD COLUMNS`/`DROP COLUMN` commit a metadata-only
  * schema-evolution version. DML: `INSERT INTO`/`INSERT OVERWRITE`
  * publish versions through the V1 write bridge, `DELETE FROM` is the
  * stats-pruned copy-on-write [[Snapshots.deleteWhere]], `TRUNCATE`
  * publishes an empty version — all on the single-writer contract
  * (ACID multi-writer coordination is out of scope).
  */
class SnapshotCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires option 'warehouse' " +
          s"(spark.sql.catalog.$name.warehouse=<dir of snapshot roots>)"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def rootOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$warehouse/", "/", "")

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((warehouse +: namespace).mkString("/"))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => Snapshots.versions(spark, s"$dir/$n").nonEmpty)
      .sorted.map(Identifier.of(namespace, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    scala.util.Try(Snapshots.versions(spark, rootOf(ident)).nonEmpty).getOrElse(false)

  private def load(ident: Identifier, version: Int): Table = {
    val root = rootOf(ident)
    val schema = Snapshots.schemaOf(spark, root, version).getOrElse(
      throw new IllegalStateException(
        s"v$version under $root records no schema header"))
    new SnapshotTable(schema, root, Map("version" -> version.toString))
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    val vs = scala.util.Try(Snapshots.versions(spark, root)).getOrElse(Nil)
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    // latest is NOT pinned: each scan of the returned table re-resolves,
    // so a long-lived cached table keeps seeing new publishes
    val schema = Snapshots.schemaOf(spark, root, vs.last).getOrElse(
      throw new IllegalStateException(s"v${vs.last} under $root records no schema header"))
    new SnapshotTable(schema, root, Map.empty)
  }

  /** `FOR VERSION AS OF v` */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = scala.util.Try(version.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot versions are integers, got '$version'"))
    require(Snapshots.versions(spark, rootOf(ident)).contains(v),
      s"version $v does not exist under ${rootOf(ident)}")
    load(ident, v)
  }

  /** `FOR TIMESTAMP AS OF t` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    load(ident, Snapshots.versionAt(spark, rootOf(ident),
      Math.floorDiv(timestampMicros, 1000L)))
  }

  override def invalidateTable(ident: Identifier): Unit = () // nothing cached

  /** `CREATE TABLE`: publish an empty v1 carrying the declared schema. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "snapshot tables are file-clustered (compact zorderBy), not hive-partitioned")
    require(!tableExists(ident),
      s"table ${ident.name()} already exists under $warehouse")
    val root = rootOf(ident)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Snapshots.publish(spark, root, empty)
    loadTable(ident)
  }

  /** `ALTER TABLE ADD COLUMNS` / `DROP COLUMN` as a METADATA-ONLY
    * publish: the next version re-lists the head's files under the new
    * schema ([[Snapshots.evolveSchema]]) — no data moves, added columns
    * read back null-filled, dropped columns stop being projected, and
    * time travel still serves every old version under ITS schema.
    * RENAME COLUMN is refused: parquet projection is by-name, so a
    * rename would silently orphan every existing value (rewrite via
    * publish instead). Type changes refuse for the same reason.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = rootOf(ident)
    val v = Snapshots.versions(spark, root).last
    val old = Snapshots.schemaOf(spark, root, v).getOrElse(
      throw new IllegalStateException(s"v$v under $root records no schema header"))
    val evolved = changes.foldLeft(old) {
      case (s, add: TableChange.AddColumn) =>
        require(add.fieldNames.length == 1,
          s"nested ADD COLUMN (${add.fieldNames.mkString(".")}) is not supported")
        require(add.position() == null,
          "positioned ADD COLUMN (FIRST/AFTER) is not supported — new columns append")
        val name = add.fieldNames.head
        require(!s.fieldNames.contains(name), s"column '$name' already exists")
        require(add.isNullable,
          s"added column '$name' must be nullable: existing rows have no value")
        val f = StructField(name, add.dataType, nullable = true)
        s.add(Option(add.comment).fold(f)(f.withComment))
      case (s, del: TableChange.DeleteColumn) =>
        require(del.fieldNames.length == 1,
          s"nested DROP COLUMN (${del.fieldNames.mkString(".")}) is not supported")
        val name = del.fieldNames.head
        require(s.fieldNames.contains(name), s"column '$name' does not exist")
        require(s.fields.length > 1, "cannot drop the last column")
        StructType(s.fields.filterNot(_.name == name))
      case (_, other) =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE change ${other.getClass.getSimpleName} is not supported: " +
            "parquet projection is by-name, so renames/type changes would " +
            "orphan or reinterpret existing values — rewrite via publish")
    }
    Snapshots.evolveSchema(spark, root, evolved)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(new Path(rootOf(ident)), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    require(!tableExists(newIdent), s"table ${newIdent.name()} already exists")
    require(fs.rename(new Path(rootOf(oldIdent)), new Path(rootOf(newIdent))),
      s"filesystem refused to move ${rootOf(oldIdent)} -> ${rootOf(newIdent)}")
  }
}
