package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Behavioral specs for the migration/compaction/verification operators —
  * the properties the reference enforced operationally (skip-if-exists,
  * post-copy verification, merge preserves content).
  */
class OperatorsSpec extends AnyFunSuite {
  import SparkTestEnv._

  private def tmp(): String = Files.createTempDirectory("graft-spec").toString

  test("migrateRange is idempotent: second run leaves an identical manifest") {
    val dest = tmp() + "/dest"
    val src = s"$sf/lineitem.parquet"
    Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-01", "1996-03-31")
    val m1 = spark.read.parquet(dest).groupBy("par_key")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s")).collect().toSet
    Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-01", "1996-03-31")
    val m2 = spark.read.parquet(dest).groupBy("par_key")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s")).collect().toSet
    assert(m1 == m2 && m1.nonEmpty)
  }

  test("migrateRange skipExisting skips overlapping partitions and alerts") {
    val dest = tmp() + "/dest"
    val src = s"$sf/lineitem.parquet"
    Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-01", "1996-03-10")
    val alerts = new Alerter.Collecting
    val r = Migrate.migrateRange(spark, src, dest, "l_shipdate", "1996-03-05", "1996-03-15",
      skipExisting = true, alerter = alerts)
    assert(r.partitionsSkipped > 0)
    assert(alerts.all.nonEmpty && alerts.all.forall(_._1 == "migrate.skip"))
    // days 05..10 written once only — row counts still match source exactly
    val got = spark.read.parquet(dest).count()
    val want = spark.read.parquet(src)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-03-16").cast("timestamp")).count()
    assert(got == want)
  }

  test("reconcile detects a dropped row and a mutated value") {
    val src = Tables.load(spark, sf, "orders")
    val key = date_format(col("o_orderdate"), "yyyyMM")
    val clean = Reconcile.diff(Reconcile.manifest(src, key), Reconcile.manifest(src, key))
    assert(clean.filter(col("status") =!= "ok").count() == 0)

    val dropped = src.orderBy("o_orderkey").limit(1)
    val dstMissing = src.exceptAll(dropped)
    val d1 = Reconcile.diff(Reconcile.manifest(src, key), Reconcile.manifest(dstMissing, key))
    assert(d1.filter(col("status") === "count_mismatch").count() == 1)

    val mutated = src.withColumn("o_totalprice",
      when(col("o_orderkey") === 1, col("o_totalprice") + 1).otherwise(col("o_totalprice")))
    val d2 = Reconcile.diff(Reconcile.manifest(src, key), Reconcile.manifest(mutated, key))
    assert(d2.filter(col("status") === "checksum_mismatch").count() == 1)
  }

  test("compact rewrite preserves the row multiset and reduces file count") {
    val frag = tmp() + "/frag"
    val dest = tmp() + "/compacted"
    // fragment: write orders as many small files
    Tables.load(spark, sf, "orders").repartition(40).write.parquet(frag)
    val stats = Compact.rewrite(spark, frag, dest)
    assert(stats.filesBefore == 40)
    assert(stats.filesAfter < stats.filesBefore)
    val a = spark.read.parquet(frag).agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    val b = spark.read.parquet(dest).agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    assert(a.getLong(0) == b.getLong(0))
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
  }

  test("partition enumeration matches the reference's dedup semantics") {
    val monthly = Partitions.enumerate(spark, "2017-11-01", "2018-01-15", "yyyyMM")
      .orderBy("partition_value").collect().map(_.getString(0)).toSeq
    assert(monthly == Seq("201711", "201712", "201801"))
    val daily = Partitions.enumerate(spark, "2017-11-01", "2017-11-30", "yyyyMMdd").count()
    assert(daily == 30)
    val dm = Partitions.dayMap(spark, "2017-12-30", "2018-01-02", "yyyyMM")
    assert(dm.count() == 4)
    assert(dm.filter(col("partition_value") === "201801").count() == 2)
  }
}
