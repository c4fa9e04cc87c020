package graft

import graft.operators.Catalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Catalog-layer specs: the reference's warehouse convention
  * (`<warehouse>/<db>.db/<table>/<pn>=<v>`, KeyConstant.java:26) driven
  * through `db.table` names instead of paths — registration, location
  * resolution, partition discovery, and the CLI's `-catalog` mode.
  */
class CatalogSpec extends AnyFunSuite {
  import SparkTestEnv._

  test("db.table-addressed migrate: registered dest, partitions discovered, prunable") {
    val root = Files.createTempDirectory("graft-catalog").toString
    spark.sql("DROP DATABASE IF EXISTS gsrc CASCADE")
    spark.sql("DROP DATABASE IF EXISTS gdst CASCADE")
    spark.sql(s"CREATE DATABASE gsrc LOCATION '$root/gsrc.db'")
    spark.sql(s"CREATE DATABASE gdst LOCATION '$root/gdst.db'")
    val srcPath = s"$root/gsrc.db/lineitem"
    spark.read.parquet(s"$sf/lineitem.parquet").write.parquet(srcPath)
    Catalog.register(spark, "gsrc", "lineitem", srcPath)
    assert(spark.table("gsrc.lineitem").count() > 0)

    val r = Catalog.migrateRangeTable(spark, "gsrc.lineitem", "gdst.lineitem",
      "l_shipdate", "1996-03-01", "1996-03-07")
    assert(r.partitionsWritten > 0)
    // SHOW PARTITIONS sees exactly the migrated days (the reference's
    // directory listing, as catalog metadata)
    val parts = Catalog.partitions(spark, "gdst.lineitem")
    assert(parts.size.toLong == r.partitionsWritten)
    assert(parts.forall(_.startsWith("par_key=199603")), parts.mkString(","))
    // row-complete through TABLE names
    val got = spark.table("gdst.lineitem").count()
    val want = spark.table("gsrc.lineitem").filter(
      col("l_shipdate") >= to_timestamp(lit("1996-03-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-03-08"))).count()
    assert(got == want && got == r.rowsWritten)
    // a partition-key filter through the catalog table stays partial —
    // pruning works against discovered partitions
    val day = parts.head.stripPrefix("par_key=")
    val one = spark.table("gdst.lineitem").filter(col("par_key") === day).count()
    assert(one > 0 && one < got)
  }

  test("re-register refreshes an evolved schema (metadata only, files untouched)") {
    val root = Files.createTempDirectory("graft-catalog-evolve").toString
    spark.sql("DROP DATABASE IF EXISTS gevo CASCADE")
    spark.sql(s"CREATE DATABASE gevo LOCATION '$root/gevo.db'")
    val path = s"$root/gevo.db/t"
    spark.range(10).select(col("id")).write.parquet(path)
    Catalog.register(spark, "gevo", "t", path)
    assert(spark.table("gevo.t").columns.toSeq == Seq("id"))
    // the data gains a column; a stale catalog entry would keep serving
    // only `id`
    spark.range(10).select(col("id"), (col("id") * 2).as("extra"))
      .write.mode("overwrite").parquet(path)
    Catalog.register(spark, "gevo", "t", path)
    assert(spark.table("gevo.t").columns.toSet == Set("id", "extra"))
    assert(spark.table("gevo.t").count() == 10)
  }

  test("drop partition, retention sweep, and properties round-trip") {
    val root = Files.createTempDirectory("graft-catalog-drop").toString
    spark.sql("DROP DATABASE IF EXISTS gret CASCADE")
    spark.sql(s"CREATE DATABASE gret LOCATION '$root/gret.db'")
    val path = s"$root/gret.db/ev"
    spark.range(100).select(
        (col("id") % 5).cast("string").as("par_key"), col("id").as("v"))
      .write.partitionBy("par_key").parquet(path)
    Catalog.register(spark, "gret", "ev", path, Seq("par_key"))
    assert(Catalog.partitions(spark, "gret.ev").size == 5)

    // properties: set → read back; survive a schema-evolving re-register
    Catalog.setTableProperties(spark, "gret.ev",
      Map("graft.owner" -> "pipeline", "graft.retention" -> "30d"))
    assert(Catalog.tableProperties(spark, "gret.ev")("graft.owner") == "pipeline")
    spark.read.parquet(path).withColumn("extra", lit(1))
      .write.partitionBy("par_key").mode("overwrite").parquet(path)
    Catalog.register(spark, "gret", "ev", path, Seq("par_key"))
    assert(spark.table("gret.ev").columns.contains("extra"))
    val props = Catalog.tableProperties(spark, "gret.ev")
    assert(props("graft.owner") == "pipeline" && props("graft.retention") == "30d")

    // metadata-only drop: catalog forgets the partition, reads exclude it,
    // the directory SURVIVES (external semantics)
    Catalog.dropPartition(spark, "gret.ev", Seq("par_key" -> "3"))
    assert(Catalog.partitions(spark, "gret.ev").size == 4)
    assert(spark.table("gret.ev").filter(col("par_key") === "3").count() == 0)
    assert(new java.io.File(s"$path/par_key=3").exists())
    // recover re-adopts the orphaned directory
    spark.catalog.recoverPartitions("gret.ev")
    assert(Catalog.partitions(spark, "gret.ev").size == 5)

    // purge drop also removes the files
    Catalog.dropPartition(spark, "gret.ev", Seq("par_key" -> "3"), purge = true)
    assert(!new java.io.File(s"$path/par_key=3").exists())

    // retention sweep: everything below the cutoff goes, in one call
    val dropped = Catalog.dropPartitionsOlderThan(spark, "gret.ev", cutoff = "2",
      purge = true)
    assert(dropped.sorted == Seq("0", "1"))
    assert(Catalog.partitions(spark, "gret.ev") == Seq("par_key=2", "par_key=4"))
    assert(spark.table("gret.ev").select("par_key").distinct().collect()
      .map(_.getString(0)).sorted.toSeq == Seq("2", "4"))
  }

  test("CLI -catalog mode: database names in, verified migrate + registered table out") {
    val root = Files.createTempDirectory("graft-catalog-cli").toString
    spark.sql("DROP DATABASE IF EXISTS csrc CASCADE")
    spark.sql("DROP DATABASE IF EXISTS cdst CASCADE")
    spark.sql(s"CREATE DATABASE csrc LOCATION '$root/csrc.db'")
    spark.sql(s"CREATE DATABASE cdst LOCATION '$root/cdst.db'")
    val srcPath = s"$root/csrc.db/orders"
    spark.read.parquet(s"$sf/orders.parquet").write.parquet(srcPath)
    Catalog.register(spark, "csrc", "orders", srcPath)
    val alerts = new graft.operators.Alerter.Collecting
    graft.cli.Main.run("trans-whole-table", Map(
        "srcDB" -> "csrc", "distDB" -> "cdst", "table" -> "orders",
        "dateCol" -> "o_orderdate", "pp" -> "yyyyMM", "catalog" -> "true"),
      spark, alerts)
    // post-copy verify reconciled clean (no alerts) and the destination is
    // a queryable, partition-discovered catalog table
    assert(alerts.all.isEmpty, alerts.all.mkString(";"))
    assert(spark.table("cdst.orders").count() == spark.table("csrc.orders").count())
    assert(Catalog.partitions(spark, "cdst.orders").nonEmpty)
  }
}
