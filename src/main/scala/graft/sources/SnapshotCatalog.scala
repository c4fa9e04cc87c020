package graft.sources

import graft.operators.Snapshots

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
  * removes the root, `RENAME` is a filesystem move (atomic same-FS).
  * Writes go through the table API ([[Snapshots.publish]]/`mergeByKey`/
  * `deleteWhere`...) — ACID multi-writer SQL DML is out of scope, and
  * `ALTER TABLE` is refused (snapshot schema evolution happens at
  * publish time, recorded per version).
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

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "snapshot schema evolves at publish time (per-version schema headers); " +
        "ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(new Path(rootOf(ident)), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    require(!tableExists(newIdent), s"table ${newIdent.name()} already exists")
    require(fs.rename(new Path(rootOf(oldIdent)), new Path(rootOf(newIdent))),
      s"filesystem refused to move ${rootOf(oldIdent)} -> ${rootOf(newIdent)}")
  }
}
